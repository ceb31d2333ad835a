"""Fixed-capacity sparse structures (pytrees).

TPU-native replacement for torchsparse's ``SparseTensor``/``PointTensor``:
instead of variable-length coordinate lists, every level of the sparse U-Net
is a fixed-capacity table sorted by packed coordinate key. Feature arrays are
carried separately from the (index-only) grid structure so the same grid can
serve many channel widths, mirroring how the reference caches ``cmaps`` /
``kmaps`` across layers (``core/models/utils.py:59-63``).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.struct
import jax


class VoxelGrid(flax.struct.PyTreeNode):
    """A fixed-capacity set of active voxels at one stride level.

    coords are in *finest-grid units* (multiples of ``stride``), matching
    torchsparse's convention where stride-s coords remain integers on the
    stride-1 lattice. The table is sorted by packed key; ``key_hi/key_lo``
    enable O(log V) binary-search lookup.
    """

    coords: jax.Array   # [V, 3] int32
    mask: jax.Array     # [V] bool
    key_hi: jax.Array   # [V] uint32, sorted ascending (padding = INVALID_KEY)
    key_lo: jax.Array   # [V] uint32
    num: jax.Array      # [] int32 actual count
    stride: int = flax.struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.coords.shape[-2]


class WindowGeom(flax.struct.PyTreeNode):
    """Host-precomputed window geometry for one attention branch at one
    U-Net level (built by ``data/wgeom_host.py``; consumed by the flash
    kernel wrapper ``ops.pallas.wattn_kernel.flash_pregeom_batched``).

    The flattened [B*V] voxel batch is window-sorted on the host; the device
    only gathers by ``order``, runs the kernel over the precomputed per-tile
    [kmin, kmax) ranges, and gathers back by ``inv`` — no in-program sorts,
    segment scans, or quantization index math (the round-2 serialization
    bottleneck, PERF.md).
    """

    order: jax.Array   # [pad_to] int32 gather order (pads -> 0, dead rank)
    inv: jax.Array     # [B*V] int32 inverse permutation
    rank: jax.Array    # [pad_to] f32 dense window id in sorted order
    quant: jax.Array   # [pad_to, 3] int32 quantized in-window coords (sorted)
    kmin: jax.Array    # [pad_to/tile] int32
    kmax: jax.Array    # [pad_to/tile] int32
    occ: jax.Array     # [1] int32 max window occupancy (overflow counter)
    r: Optional[jax.Array] = None  # [pad_to] f32 range (sphere branch)


class LevelContext(flax.struct.PyTreeNode):
    """Per-level index plumbing built once per forward pass.

    Holds the rulebooks shared by all conv layers at this level — the
    analogue of torchsparse kernel-map caching (``cmaps``/``kmaps``).

      nbr27:        [27, V] int32 rows of the 3x3x3 stride-1 neighbors
                    (-1 where absent) — used by every ks=3/s=1 conv.
      down_nbr8:    [8, V] int32 rows *in the finer level* feeding each voxel
                    of this level through the ks=2/s=2 downsample conv
                    (None for level 0).
      up_parent:    [V] int32 row *in the coarser level* that feeds each voxel
                    of this level through the ks=2/s=2 transposed conv
                    (None for the deepest level); always valid where mask.
      up_koff:      [V] int32 in [0,8) kernel-offset index of this voxel
                    relative to its parent (None with up_parent).
    """

    grid: VoxelGrid
    nbr27: jax.Array
    down_nbr8: Optional[jax.Array] = None
    up_parent: Optional[jax.Array] = None
    up_koff: Optional[jax.Array] = None
    # Pallas banded-conv tiling (host-built, ``data/plumbing_host.py``):
    # packed Morton source-tile lists/counts and per-offset tile ranges,
    # plus the lane-friendly transposed rulebook. None on the in-jit
    # plumbing path -> convs use the XLA gather formulation.
    conv_jl: Optional[jax.Array] = None    # [B, NT, BMAX] int32
    conv_jn: Optional[jax.Array] = None    # [B, NT] int32
    conv_kr: Optional[jax.Array] = None    # [B, NT, 27, 2] int32
    nbr27_t: Optional[jax.Array] = None    # [B, V, 27] int32

    def conv_plan(self):
        """(nbr27_t, jl, jn, kr) for the pallas rulebook conv, or None."""
        if self.conv_jl is None:
            return None
        return (self.nbr27_t, self.conv_jl, self.conv_jn, self.conv_kr)
