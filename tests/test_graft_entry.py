"""Driver-contract tests: entry() compiles and runs; dryrun_multichip works."""
import sys
import pathlib
import pytest

import numpy as np
import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import __graft_entry__  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    state, maps = jax.jit(fn)(*args)
    jax.block_until_ready(maps.displacement)
    assert maps.displacement.shape[0] == 3
    assert bool(jax.numpy.isfinite(maps.displacement).all())


@pytest.mark.slow
def test_dryrun_multichip_eight_virtual_devices():
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_odd_count():
    __graft_entry__.dryrun_multichip(5)


def test_ocean_resize():
    from godotoceanwaves_tpu import Ocean
    ocean = Ocean(map_size=64, updates_per_second=0)
    ocean.update(0.02)
    ocean.resize(128)
    maps = ocean.update(0.02)
    assert maps.displacement.shape == (3, 3, 128, 128)
    assert np.isfinite(np.asarray(maps.displacement)).all()
