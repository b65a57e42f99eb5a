"""Training-convergence regression (VERDICT r2 missing #3 / SURVEY §4d):
a fixed-seed short ACC-UNet run on a learnable synthetic task must actually
LEARN — loss descends below a recorded bound and EVAL-MODE val dice exceeds a
floor. This is the guard for every future perf rewrite of the compute path: a
kernel/layout change that silently breaks gradients or batch-stat plumbing
fails here, not after an epoch on a real dataset.

The task: bright blobs on noise, mask = the blob support. Recorded trajectory
(CPU f32, seed 0, 10 batches/epoch of b4 32x32, Adam 1e-2 cosine):
  epoch:      1      2      3      4      5      6      7      8
  train loss  0.606  0.420  0.273  0.171  0.114  0.084  0.068  0.056
  val  dice   0.160  0.115  0.201  0.113  0.254  0.742  0.862  0.892
The val column shows WHY this asserts at epoch 8, not 3: eval-mode BatchNorm
uses running stats, which lag the fast-moving activation statistics of early
training through ACC-UNet's ~50 BN layers (train-mode forward on val data is
already at dice 0.80 by epoch 4) — same transient the torch reference has.

Not marked quick: the cold XLA:CPU compile of the train step is ~2.5 min on
this 1-core host (the 80 training steps themselves are ~30 s warm).
"""

import numpy as np

import jax
import jax.numpy as jnp

from accunet_tpu.models.acc_unet import ACCUNet
from accunet_tpu.train import losses as L
from accunet_tpu.train.engine import make_train_fns, run_epoch


def _blob_batches(n_batches, batch=4, hw=32, seed=0):
    rs = np.random.RandomState(seed)
    batches = []
    for _ in range(n_batches):
        imgs = rs.rand(batch, hw, hw, 3).astype(np.float32) * 0.2
        masks = np.zeros((batch, hw, hw, 1), np.float32)
        for i in range(batch):
            cy, cx = rs.randint(8, hw - 8, 2)
            r = rs.randint(4, 8)
            yy, xx = np.mgrid[:hw, :hw]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
            masks[i, :, :, 0] = blob
            imgs[i, :, :, 0] += 0.8 * blob
        batches.append({"image": jnp.asarray(imgs), "mask": jnp.asarray(masks)})
    return batches


def test_acc_unet_converges_on_synthetic_task():
    model = ACCUNet(n_channels=3, n_classes=1, n_filts=8, final_sigmoid=False)
    train = _blob_batches(10, seed=0)
    val = _blob_batches(2, seed=99)
    fns = make_train_fns(
        model, train[0], loss_fn=L.binary_dice_bce, learning_rate=1e-2,
        steps_per_epoch=10, dice_show=L.binary_dice_show,
        rng=jax.random.PRNGKey(0),
    )

    state = fns.state
    losses = []
    for _ in range(8):  # 80 steps
        state, tr = run_epoch(fns.train_step, state, iter(train), True)
        losses.append(tr["loss"])
    _, va = run_epoch(fns.eval_step, state, iter(val), False)

    # recorded-trajectory bounds (generous margins over the measured run)
    assert losses[0] < 0.80, losses   # measured 0.606
    assert losses[-1] < 0.12, losses  # measured 0.056
    assert losses[-1] < losses[0] * 0.25, losses
    assert all(b < a + 0.02 for a, b in zip(losses, losses[1:])), losses
    assert va["dice"] > 0.70, va      # measured 0.892 (eval-mode, val split)
