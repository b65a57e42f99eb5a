from accunet_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    shard_batch,
    replicate,
)
