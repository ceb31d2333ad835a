from u2mkd_tpu.ops import hashing, voxelize
