"""Solver registry: extend_type/format_type -> trainer class.

Mirror of create_svd_trainer / create_svd_ranker (apex_svd.cpp:32-47).
Custom solvers register via ``register_trainer`` instead of relinking.
"""

from __future__ import annotations

from typing import Callable, Dict

from ..params import SVDTypeParam, svd_type

_REGISTRY: Dict[int, Callable] = {}


def register_trainer(extend_type: int, factory: Callable) -> None:
    _REGISTRY[extend_type] = factory


def create_svd_trainer(mtype: SVDTypeParam):
    """apex_svd.cpp:32-44 dispatch."""
    from .base import SVDFeatureTrainer

    et = mtype.extend_type
    if et in _REGISTRY:
        return _REGISTRY[et](mtype)
    if et == 1:
        from .svdpp import SVDPPFeatureTrainer

        return SVDPPFeatureTrainer(mtype)
    if et == 2:
        from .multi_imfb import SVDPPMultiIMFBTrainer

        return SVDPPMultiIMFBTrainer(mtype)
    if et == 15:
        from .bilinear import SVDBiLinearTrainer

        return SVDBiLinearTrainer(mtype)
    if et in (30, 31):
        from .gbrt import create_gbrt_trainer

        return create_gbrt_trainer(mtype)
    if et != 0:
        raise ValueError(f"unknown extension type {et}")
    if mtype.format_type == svd_type.USER_GROUP_FORMAT:
        from .svdpp import SVDPPFeatureTrainer

        return SVDPPFeatureTrainer(mtype)
    return SVDFeatureTrainer(mtype)


def create_svd_ranker(mtype: SVDTypeParam):
    """apex_svd.cpp:45-47."""
    from .ranker import SVDFeatureRanker

    return SVDFeatureRanker(mtype)
