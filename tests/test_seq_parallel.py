"""Multi-device tests on the virtual 8-CPU mesh: sequence-parallel scan and
data-parallel train step."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from accunet_tpu.parallel.seq_scan import sequence_parallel_scan


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]).reshape(8), axis_names=("seq",))


def test_sequence_parallel_scan_matches_serial(mesh):
    rs = np.random.RandomState(0)
    b, l, d = 2, 256, 16
    a = jnp.asarray(rs.uniform(0.3, 0.99, (b, l, d)).astype(np.float32))
    bb = jnp.asarray(rs.uniform(-0.5, 0.5, (b, l, d)).astype(np.float32))

    # serial oracle
    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a2 * a1, a2 * b1 + b2

    _, want = jax.lax.associative_scan(combine, (a, bb), axis=1)

    fn = shard_map(
        sequence_parallel_scan,
        mesh=mesh,
        in_specs=(P(None, "seq", None), P(None, "seq", None)),
        out_specs=P(None, "seq", None),
    )
    got = jax.jit(fn)(a, bb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4)
