from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from tests._harness import open_oracle  # noqa: E402

#: Parity tests default to the smallest SF for speed; set
#: TEST_SF_DIR=/root/testdata/sf0.01 for a driver-equivalent run.
SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_sessionstart(session):
    """Fixture-schema tripwire (round-3 lesson): if the driver
    regenerated the parquet fixtures with a dtype the engine does not
    normalize, fail the whole session with ONE clear message instead
    of dozens of downstream AnalysisExceptions."""
    if not Path(SF_DIR).is_dir():
        # No fixtures on this machine: let fixture-reading tests fail
        # individually; pure unit tests must still run.
        import warnings

        warnings.warn(f"fixture dir {SF_DIR} missing; skipping schema tripwire")
        return
    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    from check_fixture_schemas import check

    problems = check(SF_DIR)
    if problems:
        raise pytest.UsageError(
            "fixture schema drift in %s:\n%s" % (SF_DIR, "\n".join(problems))
        )


@pytest.fixture(scope="session")
def spark():
    from hadoop_release_spark.session import get_session

    s = get_session("hadoop-release-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = open_oracle(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
