from __future__ import annotations

import os
import shutil
import tempfile

import pytest
import ray

# Arm the crash-point fault hook BEFORE ray.init so Ray worker
# processes inherit it (lakecdc.config._fault_point). A no-op single
# dict lookup unless a test drops a _faults.json control file.
os.environ["LAKECDC_FAULT_FUZZ"] = "1"


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="lakecdc_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
