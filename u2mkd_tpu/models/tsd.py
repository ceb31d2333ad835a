"""TSD wrapper: frozen multisweep teacher + cross-modal student.

Re-design of ``SPVCNN_SWIFTNET18_SPFORMER_TSD_FULL`` (reference
``core/models/nuscenes/spvcnn_swiftnet18_spformer_tsd_full.py:562-596``):
the wrapper holds a student (``model_s``, MSP2IFM with an adapt layer mapping
its stage-4 point features to the teacher width) and a frozen teacher
(``model_t``, SPVCNN+SphereFormer at ``cr_t`` on the multisweep cloud).
Freezing is enforced by (a) ``stop_gradient`` on every teacher output and
(b) a zero-update optimizer mask on the ``model_t`` subtree
(see :mod:`u2mkd_tpu.train.distill`); the teacher always runs in eval mode
(the reference calls ``model_t.eval()`` every epoch).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax

from u2mkd_tpu.models.msp2ifm import SPVCNNSwiftNetMSP2IFM
from u2mkd_tpu.models.spvcnn import SPVCNN


class TSDFull(nn.Module):
    num_classes: int = 17
    cr: float = 1.0
    cr_t: float = 2.0
    in_channel: int = 4
    in_channel_t: int = 4  # undefined in the shipped reference YAMLs
                           # (latent KeyError, SURVEY §2.2) — default 4 here
    axis_name: Optional[str] = None
    window_size: Tuple[float, float, float] = (0.3, 0.3, 0.3)
    window_size_sphere: Tuple[float, float, float] = (2.0, 2.0, 120.0)
    quant_size: Tuple[float, float, float] = (0.3 / 24, 0.3 / 24, 0.3 / 24)
    quant_size_sphere: Tuple[float, float, float] = (2.0 / 24, 2.0 / 24, 5.0)
    window_size_scale: Tuple[float, float] = (2.0, 2.0)
    drop_path_rate: float = 0.3
    sphere_a: float = 0.0125
    head_dim: int = 16
    run_pix_decoder: bool = True
    pallas_attention: bool = False
    pallas_cubic: bool = True

    @nn.nowrap
    def _common_kwargs(self):
        return dict(
            num_classes=self.num_classes, axis_name=self.axis_name,
            window_size=self.window_size,
            window_size_sphere=self.window_size_sphere,
            quant_size=self.quant_size,
            quant_size_sphere=self.quant_size_sphere,
            window_size_scale=self.window_size_scale,
            drop_path_rate=self.drop_path_rate, sphere_a=self.sphere_a,
            head_dim=self.head_dim, pallas_attention=self.pallas_attention,
            pallas_cubic=self.pallas_cubic,
        )

    @nn.nowrap
    def make_teacher(self) -> SPVCNN:
        """Standalone SPVCNN with the exact ``model_t`` configuration —
        apply it with ``params["model_t"]`` / ``batch_stats["model_t"]`` to
        run the frozen teacher as its OWN program (the split distill step,
        ``train/distill.py:make_distill_split_steps``). Single source with
        ``setup`` so the two can't drift."""
        return SPVCNN(
            cr=self.cr_t, in_channel=self.in_channel_t, sphereformer=True,
            return_point_feats=True, **self._common_kwargs(),
        )

    @nn.nowrap
    def make_student(self) -> SPVCNNSwiftNetMSP2IFM:
        """Standalone student with the exact ``model_s`` configuration
        (used for FLOP accounting and student-only program construction)."""
        return SPVCNNSwiftNetMSP2IFM(
            cr=self.cr, in_channel=self.in_channel,
            adapt_out_ch=int(self.cr_t * 256),
            run_pix_decoder=self.run_pix_decoder, **self._common_kwargs(),
        )

    def setup(self):
        self.model_s = self.make_student()
        self.model_t = self.make_teacher()

    def __call__(self, student_batch, student_plumbing, teacher_batch,
                 teacher_plumbing, train: bool, run_teacher: bool = True):
        out = {
            "stu": self.model_s(
                student_batch["feats"], student_plumbing,
                student_batch["images"], student_batch["pix_coords"],
                student_batch["cam_masks"], student_batch["fov_mask"], train,
            )
        }
        if run_teacher:
            # teacher always in eval mode, outputs detached
            t_out = self.model_t(teacher_batch["feats"], teacher_plumbing, False)
            out["t"] = jax.tree_util.tree_map(jax.lax.stop_gradient, t_out)
        return out

    def lidar_only(self, student_batch, student_plumbing, train: bool = False):
        """Camera-free student inference path."""
        return self.model_s(
            student_batch["feats"], student_plumbing, None, None, None, None,
            train, lidar_only=True,
        )
