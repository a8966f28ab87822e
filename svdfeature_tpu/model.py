"""SVDModel: the parameter store, as a JAX pytree.

Re-design of struct SVDModel (apex_svd_model.h:481-706).  The reference
allocates one contiguous ``[ufeedback?][user][item]`` block with zero-copy
sub-views; we keep the same unified-row-space layout — a single factor
table ``w: [N, k]`` and bias table ``b: [N]`` plus ``g: [G]`` — because it
makes every lookup (user / item / feedback segment) one gather into one
table (one fused kernel, one sharding spec), and it makes
common_latent_space / common_feedback_space pure offset arithmetic.

Binary checkpoint format is bit-compatible with the reference
(SVDModelParam struct then tensors as [shape ints][row-major float32],
apex_svd_model.h:638-660, apex-tensor/apex_tensor_cpu_inline_common.h:72-95)
so models can be exchanged with the reference binaries in either direction.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import BinaryIO, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import losses
from .params import SVDModelParam, SVDTypeParam, svd_type


def _write_t1d(f: BinaryIO, arr: np.ndarray) -> None:
    """CTensor1D serialization: [x_max:int32][x_max float32]."""
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    f.write(struct.pack("<i", arr.shape[0]))
    f.write(arr.tobytes())


def _write_t2d(f: BinaryIO, arr: np.ndarray) -> None:
    """CTensor2D serialization: [x_max:int32][y_max:int32][rows of x_max f32].

    Note the struct field order is x_max then y_max (apex_tensor_cpu.h:102-106).
    """
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    y, x = arr.shape
    f.write(struct.pack("<ii", x, y))
    f.write(arr.tobytes())


def _read_t1d(f: BinaryIO) -> np.ndarray:
    (x,) = struct.unpack("<i", f.read(4))
    return np.frombuffer(f.read(4 * x), dtype="<f4").copy() if x > 0 else np.zeros(0, np.float32)


def _read_t2d(f: BinaryIO) -> np.ndarray:
    x, y = struct.unpack("<ii", f.read(8))
    n = x * y
    if n > 0:
        return np.frombuffer(f.read(4 * n), dtype="<f4").reshape(y, x).copy()
    return np.zeros((y, x), np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SVDModel:
    """Unified-table model pytree.

    Row space of ``w`` / ``b``:
      [0, off_user)            user-feedback rows (if separate feedback space)
      [off_user, off_item)     user rows
      [off_item, num_rows)     item rows
    With common_latent_space=1 the whole table is shared (all offsets 0);
    with common_feedback_space=1 feedback rows alias user rows (off=off_user).
    """

    w: jax.Array  # [N, k] factor table
    b: jax.Array  # [N] bias table
    g: jax.Array  # [G] global bias
    param: SVDModelParam = dataclasses.field(metadata=dict(static=True))
    mtype: SVDTypeParam = dataclasses.field(metadata=dict(static=True))

    # ---- layout ----------------------------------------------------------
    @staticmethod
    def layout(param: SVDModelParam, mtype: SVDTypeParam) -> Tuple[int, int, int, int]:
        """Return (num_rows, off_ufeedback, off_user, off_item).

        Mirrors SVDModel::alloc_space (apex_svd_model.h:511-556).
        """
        ustart = (
            param.num_ufeedback
            if (
                param.common_feedback_space == 0
                and mtype.format_type == svd_type.USER_GROUP_FORMAT
            )
            else 0
        )
        if param.common_latent_space == 0:
            n = ustart + param.num_user + param.num_item
            return n, 0, ustart, ustart + param.num_user
        if param.num_user != param.num_item:
            raise ValueError("num_user and num_item must be the same to use common latent space")
        if param.common_feedback_space == 0:
            raise ValueError("common latent space must enforce common feedback space")
        return param.num_item, 0, 0, 0

    @property
    def num_rows(self) -> int:
        return self.layout(self.param, self.mtype)[0]

    @property
    def off_ufeedback(self) -> int:
        return self.layout(self.param, self.mtype)[1]

    @property
    def off_user(self) -> int:
        return self.layout(self.param, self.mtype)[2]

    @property
    def off_item(self) -> int:
        return self.layout(self.param, self.mtype)[3]

    @property
    def num_factor(self) -> int:
        return self.param.num_factor

    # ---- construction ----------------------------------------------------
    @classmethod
    def alloc(cls, param: SVDModelParam, mtype: SVDTypeParam) -> "SVDModel":
        n, _, _, _ = cls.layout(param, mtype)
        k = param.num_factor
        return cls(
            w=jnp.zeros((n, k), jnp.float32),
            b=jnp.zeros((n,), jnp.float32),
            g=jnp.zeros((param.num_global,), jnp.float32),
            param=param,
            mtype=mtype,
        )

    @classmethod
    def rand_init(
        cls,
        param: SVDModelParam,
        mtype: SVDTypeParam,
        seed: int = 10,
        exact_rng: bool = False,
    ) -> "SVDModel":
        """Gaussian init with the reference's ordering semantics
        (apex_svd_model.h:665-705).

        Default PRNG is numpy (fast, vectorized; parity is distributional).
        With ``exact_rng`` the draws come from the bit-exact apex_random
        port (utils/apex_random.py) in the reference's fill order — user
        factors, item factors, feedback factors — so a seeded init is
        byte-identical to the reference binary's round-0 model snapshot
        (verified vs .baseline/demo/*/0000.model in tests).

        Transforms base_score through the inverse link exactly once.
        """
        n, off_fb, off_u, off_i = cls.layout(param, mtype)
        k = param.num_factor
        if exact_rng:
            from .utils.apex_random import ApexRandom

            rng = ApexRandom(seed)

            def normal(sigma, shape):
                # sd is a C float in the reference (SVDModelParam), so the
                # double multiply sees the f32-rounded sigma
                return rng.gaussian_array(shape, float(np.float32(sigma)))
        else:
            nprng = np.random.RandomState(seed)

            def normal(sigma, shape):
                return nprng.normal(0.0, sigma, shape)

        w = np.zeros((n, k), np.float32)

        # user factors
        nu = param.num_randinit_ufactor or param.num_user
        w[off_u : off_u + nu] = normal(param.u_init_sigma, (nu, k))
        if param.user_nonnegative:
            w[off_u : off_u + param.num_user] = np.abs(w[off_u : off_u + param.num_user])
        # item factors (skipped entirely when the latent space is shared)
        if param.common_latent_space == 0:
            ni = param.num_randinit_ifactor or param.num_item
            w[off_i : off_i + ni] = normal(param.i_init_sigma, (ni, k))
            if param.item_nonnegative:
                w[off_i : off_i + ni] = np.abs(w[off_i : off_i + ni])
        # feedback factors last — with a shared feedback space this
        # overwrites the user rows, exactly as the reference does
        if mtype.format_type == svd_type.USER_GROUP_FORMAT:
            nf = param.num_ufeedback
            if param.common_feedback_space == 0:
                w[off_fb : off_fb + nf] = normal(param.ufeedback_init_sigma, (nf, k))
            else:
                w[off_u : off_u + nf] = normal(param.ufeedback_init_sigma, (nf, k))

        param = dataclasses.replace(
            param,
            base_score=losses.calc_base_score(param.base_score, mtype.active_type),
        )
        return cls(
            w=jnp.asarray(w),
            b=jnp.zeros((n,), jnp.float32),
            g=jnp.zeros((param.num_global,), jnp.float32),
            param=param,
            mtype=mtype,
        )

    # ---- reference-format binary IO ---------------------------------------
    def save(self, f: BinaryIO) -> None:
        """Write the SVDModel section (apex_svd_model.h:638-660)."""
        f.write(self.param.to_bytes())
        w = np.asarray(self.w)
        b = np.asarray(self.b)
        p = self.param
        _, off_fb, off_u, off_i = self.layout(p, self.mtype)
        if p.common_latent_space == 0:
            _write_t1d(f, b[off_u : off_u + p.num_user])
            _write_t2d(f, w[off_u : off_u + p.num_user])
            _write_t1d(f, b[off_i : off_i + p.num_item])
            _write_t2d(f, w[off_i : off_i + p.num_item])
        else:
            _write_t1d(f, b)
            _write_t2d(f, w)
        _write_t1d(f, np.asarray(self.g))
        if self.mtype.format_type == svd_type.USER_GROUP_FORMAT and p.common_feedback_space == 0:
            _write_t1d(f, b[off_fb : off_fb + p.num_ufeedback])
            _write_t2d(f, w[off_fb : off_fb + p.num_ufeedback])

    @classmethod
    def load(cls, f: BinaryIO, mtype: SVDTypeParam) -> "SVDModel":
        """Read the SVDModel section (apex_svd_model.h:570-633, sans the
        fork's debug text dumps)."""
        param = SVDModelParam.from_bytes(f.read(SVDModelParam.NBYTES))
        n, off_fb, off_u, off_i = cls.layout(param, mtype)
        w = np.zeros((n, param.num_factor), np.float32)
        b = np.zeros((n,), np.float32)
        if param.common_latent_space == 0:
            b[off_u : off_u + param.num_user] = _read_t1d(f)
            w[off_u : off_u + param.num_user] = _read_t2d(f)
            b[off_i : off_i + param.num_item] = _read_t1d(f)
            w[off_i : off_i + param.num_item] = _read_t2d(f)
        else:
            b[:] = _read_t1d(f)
            w[:] = _read_t2d(f)
        g = _read_t1d(f)
        if len(g) != param.num_global:
            raise ValueError("global bias size mismatch")
        if mtype.format_type == svd_type.USER_GROUP_FORMAT and param.common_feedback_space == 0:
            b[off_fb : off_fb + param.num_ufeedback] = _read_t1d(f)
            w[off_fb : off_fb + param.num_ufeedback] = _read_t2d(f)
        return cls(
            w=jnp.asarray(w), b=jnp.asarray(b), g=jnp.asarray(g), param=param, mtype=mtype
        )
