"""Device mesh & sharding utilities.

The reference has no distributed machinery beyond eval-only
torch.nn.DataParallel (/root/reference/Experiments/test_model.py:221-223).
This module is the TPU-native replacement and extension: SPMD over a
jax.sharding.Mesh with named axes

    data    — batch data parallelism (ICI; DCN between slices)
    model   — optional tensor parallelism for the widest layers
    seq     — sequence/context parallelism for the selective-scan models

Collectives are inserted by XLA from sharding annotations (psum/all_gather/
ppermute ride ICI); nothing here issues explicit NCCL-style calls.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1   # -1: all remaining devices
    model: int = 1
    seq: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        d = self.data
        if d == -1:
            d = n_devices // (self.model * self.seq)
        if d * self.model * self.seq != n_devices:
            raise ValueError(
                f"mesh {d}x{self.model}x{self.seq} != {n_devices} devices"
            )
        return d, self.model, self.seq


def make_mesh(spec: MeshSpec | None = None, devices: Sequence | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    d, m, s = spec.resolve(len(devices))
    arr = np.array(devices).reshape(d, m, s)
    return Mesh(arr, axis_names=("data", "model", "seq"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays, leading batch dim) onto the mesh
    sharded over the `data` axis.

    Single-process: a plain device_put. Multi-process (jax.distributed
    initialized, the mesh spans hosts): each process holds only ITS slice of
    the global batch (the loader shards by process_index), so the global
    array is assembled from the per-process local shards — the multi-host DP
    input path (SURVEY §5.8)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        import numpy as np

        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def param_sharding_rules(mesh: Mesh, min_weight_size: int = 2 ** 18):
    """Return a function params_pytree -> sharding pytree.

    Policy: replicate everything except very large kernels, which are sharded
    over the `model` axis along their output-feature dim when divisible.
    (ACC-UNet's inv_fctr=34 decoder block produces a 128->4352-channel 1x1
    conv — the main beneficiary; SURVEY.md §7.3.)
    """
    model_size = mesh.shape["model"]

    def leaf(x):
        if (
            model_size > 1
            and getattr(x, "ndim", 0) >= 2
            and x.size >= min_weight_size
            and x.shape[-1] % model_size == 0
        ):
            spec = [None] * (x.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    def apply(params):
        return jax.tree_util.tree_map(leaf, params)

    # per-leaf rule, for trees that are not the params tree itself (e.g.
    # optimizer states whose mu/nu mirror the params shapes)
    apply.leaf = leaf
    return apply
