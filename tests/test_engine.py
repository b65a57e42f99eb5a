"""End-to-end training engine test: synthetic separable task, loss decreases,
checkpoint save/restore round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.models.unet import UNetBase
from accunet_tpu.train import losses as L
from accunet_tpu.train.engine import (
    fit,
    make_train_fns,
    restore_checkpoint,
    save_checkpoint,
)


def _synthetic_batches(n_batches=4, batch=4, hw=32, seed=0):
    rs = np.random.RandomState(seed)
    batches = []
    for _ in range(n_batches):
        # bright centered blob = foreground; trivially learnable
        masks = np.zeros((batch, hw, hw, 1), np.float32)
        imgs = rs.rand(batch, hw, hw, 3).astype(np.float32) * 0.1
        for i in range(batch):
            cy, cx = rs.randint(8, hw - 8, 2)
            r = rs.randint(4, 8)
            yy, xx = np.mgrid[:hw, :hw]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
            masks[i, :, :, 0] = blob
            imgs[i, :, :, 0] += blob
        batches.append({"image": jnp.asarray(imgs), "mask": jnp.asarray(masks)})
    return batches


def test_fit_loss_decreases_and_ckpt_roundtrip(tmp_path):
    model = UNetBase(3, 1, base_width=4, final_sigmoid=False)
    batches = _synthetic_batches()
    fns = make_train_fns(
        model, batches[0], loss_fn=L.binary_dice_bce, learning_rate=3e-3,
        steps_per_epoch=len(batches), dice_show=L.binary_dice_show,
    )

    state, history = fit(
        fns,
        lambda: iter(batches),
        lambda: iter(batches[:1]),
        epochs=8,
        ckpt_dir=str(tmp_path / "ckpt"),
        log_every=False,
    )
    losses = [h["train"]["loss"] for h in history]
    assert losses[-1] < losses[0] * 0.85, losses
    assert all(l2 <= l1 + 1e-3 for l1, l2 in zip(losses, losses[1:])), losses
    assert history[-1]["val"]["dice"] > history[0]["val"]["dice"] - 0.05

    # checkpoint round-trip
    path = save_checkpoint(str(tmp_path / "ckpt2"), state, epoch=6, best_dice=0.5)
    restored, meta = restore_checkpoint(path, fns.state)
    assert meta["epoch"] == 6
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


@pytest.mark.quick
def test_prefetch_loader_preserves_order_and_errors():
    from accunet_tpu.data.loader import PrefetchLoader

    class FakeLoader:
        def __init__(self):
            self.epoch = 0

        def __len__(self):
            return 5

        def set_epoch(self, e):
            self.epoch = e

        def __iter__(self):
            for i in range(5):
                yield {"i": i, "epoch": self.epoch}

    pf = PrefetchLoader(FakeLoader())
    pf.set_epoch(3)
    got = list(pf)
    assert [b["i"] for b in got] == [0, 1, 2, 3, 4]
    assert all(b["epoch"] == 3 for b in got)
    assert len(pf) == 5
    # second epoch re-iterates cleanly
    assert [b["i"] for b in pf] == [0, 1, 2, 3, 4]

    class Boom:
        def __len__(self):
            return 1

        def __iter__(self):
            yield {"i": 0}
            raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(PrefetchLoader(Boom()))


@pytest.mark.quick
def test_prefetch_loader_abandoned_consumer_releases_worker():
    """train.py peeks one val batch (next(iter(loader))) and --check-numerics
    can abort mid-epoch: the worker thread must exit instead of blocking
    forever on a full queue."""
    import threading
    import time

    from accunet_tpu.data.loader import PrefetchLoader

    class Endless:
        def __len__(self):
            return 10**6

        def __iter__(self):
            i = 0
            while True:
                yield {"i": i}
                i += 1

    before = threading.active_count()
    it = iter(PrefetchLoader(Endless(), depth=2))
    assert next(it)["i"] == 0
    it.close()  # GeneratorExit -> finally sets the closed event
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"


@pytest.mark.quick
def test_check_numerics_aborts_on_nan():
    import jax.numpy as jnp

    from accunet_tpu.train.engine import run_epoch

    def bad_step(state, batch):
        return state, {"loss": jnp.float32(float("nan"))}

    with pytest.raises(FloatingPointError, match="non-finite loss"):
        run_epoch(bad_step, {}, [{"x": 1}], train=True, check_numerics=True)

    # without the flag the epoch completes (reference behavior)
    _, agg = run_epoch(bad_step, {}, [{"x": 1}], train=True)
    assert agg["batches"] == 1
