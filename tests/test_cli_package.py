"""The spark-submit --py-files packaging surface (north-rule run mode:
``spark-submit --py-files pubcrawler_spark.zip``). Driver-side only —
no SparkSession, so this test runs without a JVM."""

import subprocess
import sys
import zipfile


def test_package_builds_importable_zip(tmp_path):
    out = tmp_path / "pubcrawler_spark.zip"
    proc = subprocess.run(
        [sys.executable, "-m", "pubcrawler_spark.cli", "package", "--out", str(out)],
        capture_output=True, text=True, check=True,
    )
    assert '"files"' in proc.stdout
    names = zipfile.ZipFile(out).namelist()
    # package root + every subpackage the engine imports at runtime
    for required in (
        "pubcrawler_spark/__init__.py",
        "pubcrawler_spark/plans/frontier.py",
        "pubcrawler_spark/operators/schedule.py",
        "pubcrawler_spark/functions/hashing.py",
        "pubcrawler_spark/cli.py",
    ):
        assert required in names, required
    assert not [n for n in names if "__pycache__" in n or not n.endswith(".py")]
    # the archive is importable exactly as spark-submit ships it
    probe = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {str(out)!r}); "
         "import pubcrawler_spark.plans.frontier; print('ok')"],
        capture_output=True, text=True, check=True, cwd=str(tmp_path),
    )
    assert probe.stdout.strip() == "ok"
