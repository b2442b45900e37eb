"""Named-axis comm layer over the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from scgrhc.parallel import comm
from scgrhc.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_collectives_inside_shard_map(mesh8):
    x = jnp.arange(8.0)

    def body(xs):  # xs: (1,) shard per device
        s = comm.all_reduce_sum(xs)
        m = comm.all_reduce_mean(xs)
        g = comm.all_gather(xs)
        i = comm.shard_index().reshape(1)
        return s, m, g, i

    s, m, g, i = shard_map(
        body, mesh=mesh8, in_specs=P("data"),
        out_specs=(P("data"), P("data"), P("data"), P("data")),
    )(x)
    np.testing.assert_allclose(np.asarray(s), np.full(8, 28.0))
    np.testing.assert_allclose(np.asarray(m), np.full(8, 3.5))
    assert g.shape == (64,)  # each shard holds the full gather (tiled)
    np.testing.assert_array_equal(np.asarray(i), np.arange(8))


def test_init_distributed_noop_single_process():
    comm.init_distributed()  # must not raise on a single process
    assert comm.process_count() >= 1
    assert comm.process_index() == 0


def test_debug_mode_toggles(monkeypatch):
    import jax as j

    from scgrhc.core import debug

    debug.enable("nan")
    assert j.config.jax_debug_nans
    j.config.update("jax_debug_nans", False)
