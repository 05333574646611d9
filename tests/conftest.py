import pytest


@pytest.fixture(scope="session")
def spark():
    from sdg_engine.session import get_spark

    s = get_spark("pytest", "local[8]")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
