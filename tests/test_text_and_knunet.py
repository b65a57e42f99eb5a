"""Text-prompt reader + KNUnet smoke."""

import numpy as np

import jax
import jax.numpy as jnp

from accunet_tpu.data.text_prompts import read_text
from accunet_tpu.models.knunet import KMUNet


def test_read_text_csv(tmp_path):
    (tmp_path / "prompts.csv").write_text(
        "image_name,prompt_text\nimg1.jpg,lesion upper left\nimg2.png,benign mass\n"
    )
    d = read_text(str(tmp_path))
    assert d == {"img1.png": "lesion upper left", "img2.png": "benign mass"}


def test_knunet_forward():
    m = KMUNet(3, 2, depths=(1, 1, 1, 1), hidden_dims=(8, 16, 32, 64), d_state=4)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(var, x, train=False)
    assert y.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(y)).all()
