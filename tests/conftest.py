import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests exercise queries at sf0.001; oracles whose SQL inlines literals
# retrained from data (knn_cosine_ivf centroids) must train on the SAME
# scale factor the queries run at.  The driver harness leaves this unset
# and gets the sf0.01 default, matching its own query runs.
os.environ.setdefault("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()
