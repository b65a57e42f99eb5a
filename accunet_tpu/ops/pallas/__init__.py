from accunet_tpu.ops.pallas.dwconv2d import dwconv2d, dwconv2d_reference
