"""Multi-IMFB trainer (extend_type=2): local implicit feedback stacks.

Re-design of SVDPPMultiIMFB (solvers/multi-imfb/apex_multi_imfb.h:31-194);
see ops/imfb.py and data/batching_imfb.py.  Config key
``ufeedback_disable_level`` (repeatable) disables feedback updates at the
given stack depth (:54-63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching_imfb import pack_imfb
from ..data.csr import PlusDataset
from ..ops.imfb import predict_batches_imfb, train_epoch_imfb
from .svdpp import SVDPPFeatureTrainer


class SVDPPMultiIMFBTrainer(SVDPPFeatureTrainer):
    # above ONEHOT_THRESHOLD the stacked epoch rides the augmented layout
    # (ops/imfb.train_epoch_imfb_big): row updates via _forward_entries +
    # dedup writes, context writebacks via _fb_writeback_big keyed fb_ctx
    SUPPORTS_BIG_TABLE = True

    def _init_mesh(self) -> None:
        raise NotImplementedError(
            "multi-chip training (mesh_data/mesh_model) is implemented for "
            "the base and SVD++ solvers; unset it for this solver"
        )

    def __init__(self, mtype):
        super().__init__(mtype)
        self.disable_levels = set()

    def set_param(self, name: str, val: str) -> None:
        if name == "ufeedback_disable_level":
            self.disable_levels.add(int(val))
        super().set_param(name, val)

    def _pack_plus(self, ds: PlusDataset, cache: bool = True):
        if self.rows_per_user > 1:
            raise NotImplementedError(
                "rows_per_user > 1 applies to the plain SVD++ solver only"
            )
        key = (id(ds), "imfb")
        if not cache or key not in self._pack_cache:
            m = self.model
            packed = pack_imfb(
                ds,
                self.users_per_batch,
                m.num_rows,
                m.param.num_global,
                m.off_user,
                m.off_item,
                m.off_ufeedback,
                feat_user=self.feat_user,
                feat_item=self.feat_item,
                num_user=m.param.num_user,
                num_item=m.param.num_item,
                num_ufeedback=m.param.num_ufeedback,
            )
            depth = packed.ctx_depth  # [C, M]
            enabled = np.ones((depth.shape[0], depth.shape[1] + 1), np.float32)
            enabled[:, -1] = 0.0  # pad slot
            for lvl in self.disable_levels:
                enabled[:, :-1][depth == lvl] = 0.0
            enabled[:, :-1][depth < 0] = 0.0  # unused slots
            entry = (
                jax.device_put(packed.device_arrays()),
                jax.device_put(packed.chunk_id),
                jax.device_put(packed.fb_arrays()),
                packed.perm,
                jax.device_put(enabled),
            )
            if not cache:
                return entry
            self._pack_cache[key] = entry
        return self._pack_cache[key]

    def _train_packed(self, entry) -> None:
        stacked, chunk_id, fb, _, enabled = entry
        if self.hp.big_table:
            from ..ops.imfb import train_epoch_imfb_big

            self.state = train_epoch_imfb_big(
                self.state, stacked, chunk_id, fb, enabled,
                jnp.float32(self.learning_rate), self.consts, self.hp,
                self.tparam.scale_lr_ufeedback,
                self.tparam.wd_ufeedback,
                self.tparam.wd_ufeedback_bias,
            )
            return
        self.state = train_epoch_imfb(
            self.state,
            stacked,
            chunk_id,
            fb,
            enabled,
            jnp.float32(self.learning_rate),
            self.consts,
            self.hp,
            self.tparam.scale_lr_ufeedback,
            self.tparam.wd_ufeedback,
            self.tparam.wd_ufeedback_bias,
        )

    def predict_all(self, ds) -> np.ndarray:
        if hasattr(ds, "epoch_dataset"):
            entry = self._pack_plus(ds.epoch_dataset(), cache=False)
        elif isinstance(ds, PlusDataset):
            entry = self._pack_plus(ds)
        else:
            return super(SVDPPFeatureTrainer, self).predict_all(ds)
        stacked, chunk_id, fb, perm, _ = entry
        preds = np.asarray(
            predict_batches_imfb(self.state_or_model(), stacked, chunk_id, fb, self.hp)
        ).reshape(-1)
        return preds[perm]
