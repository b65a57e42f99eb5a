"""SS2D / MedMamba / SpatialMamba classifier smoke tests.

(The reference implementations require the mamba_ssm CUDA extension at
import time, so component parity is pinned via the scan-oracle tests;
these verify structure and numerics stay finite.)
"""

import numpy as np

import jax
import jax.numpy as jnp

from accunet_tpu.models.medmamba import SpatialMamba, VSSM
from accunet_tpu.nn.ss2d import SS2D


def test_ss2d_forward():
    m = SS2D(d_model=16, d_state=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16), jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(var, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_medmamba_vssm():
    m = VSSM(3, num_classes=4, depths=(1, 1), dims=(16, 32), d_state=4)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(var, x, train=False)
    assert y.shape == (1, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_spatialmamba_classifier():
    m = SpatialMamba(3, num_classes=5, depths=(1, 1), dims=(16, 32), d_state=2)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3), jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(var, x, train=False)
    assert y.shape == (1, 5)
    assert np.isfinite(np.asarray(y)).all()
    feats = m.apply(var, x, train=False, return_features=True)
    assert len(feats) == 2 and feats[0].shape[-1] == 16
