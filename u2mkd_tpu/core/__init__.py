from u2mkd_tpu.core.structures import VoxelGrid, LevelContext
