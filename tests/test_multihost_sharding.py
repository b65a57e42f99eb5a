"""Per-process input sharding math (multi-host readiness, SURVEY §2.6/§5.8):
every process computes the same global batch order and takes only its
contiguous slice — the union across ranks reconstructs the single-process
global batch exactly, deterministically."""

import numpy as np
import pytest

from accunet_tpu.data.loader import BatchLoader

pytestmark = pytest.mark.quick


class _ArangeDs:
    """sample i -> image filled with i (so batches reveal their indices)."""

    def __init__(self, n, hw=4):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((self.hw, self.hw, 1), float(i), np.float32)
        return {"image": img, "label": img[..., 0] > 1e9}, f"s{i}"


def _ids(batch):
    return [int(v) for v in batch["image"][:, 0, 0, 0]]


def test_shards_partition_the_global_batch():
    n, bs, nproc = 17, 8, 4
    single = BatchLoader(_ArangeDs(n), bs, shuffle=True, seed=3, drop_last=True)
    shards = [
        BatchLoader(_ArangeDs(n), bs, shuffle=True, seed=3, drop_last=True,
                    process_index=r, process_count=nproc)
        for r in range(nproc)
    ]
    got_global = [list(single)]
    got_shards = [[list(s)] for s in shards]
    # second epoch too: the reshuffle must stay rank-consistent
    got_global.append(list(single))
    for r, s in enumerate(shards):
        got_shards[r].append(list(s))

    for ep in range(2):
        g_batches = got_global[ep]
        assert len(g_batches) == n // bs
        for bi, gb in enumerate(g_batches):
            per = bs // nproc
            recon = []
            for r in range(nproc):
                sb = got_shards[r][ep][bi]
                assert sb["image"].shape[0] == per
                recon.extend(_ids(sb))
            assert recon == _ids(gb)  # contiguous slices, exact order


def test_pad_last_true_count_per_rank():
    # n=5, bs=4, padded final global batch has true_count=1: rank 0 owns the
    # single real sample, ranks beyond it report 0 real samples
    n, bs, nproc = 5, 4, 2
    shards = [
        BatchLoader(_ArangeDs(n), bs, pad_last=True,
                    process_index=r, process_count=nproc)
        for r in range(nproc)
    ]
    last = [list(s)[-1] for s in shards]
    assert [b["count"] for b in last] == [2, 0] or [b["count"] for b in last] == [1, 0]
    # total true count across ranks equals the single-process true count
    single_last = list(BatchLoader(_ArangeDs(n), bs, pad_last=True))[-1]
    assert sum(b["count"] for b in last) == single_last["count"]


def test_validation_errors():
    with pytest.raises(ValueError, match="not divisible"):
        BatchLoader(_ArangeDs(8), 6, drop_last=True,
                    process_index=0, process_count=4)
    with pytest.raises(ValueError, match="drop_last or pad_last"):
        BatchLoader(_ArangeDs(8), 8, process_index=0, process_count=2)
    with pytest.raises(ValueError, match="out of range"):
        BatchLoader(_ArangeDs(8), 8, drop_last=True,
                    process_index=2, process_count=2)
