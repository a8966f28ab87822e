"""Pairwise-rank training-pair synthesis.

Port of PairwiseRankGenerator (apex_svd_data.cpp:812-1025): per user
block, sample (positive, negative) row pairs by label thresholds and emit
synthetic *difference-feature* rows (global and item segments merged by
sorted index with value = v_pos - v_neg; user segment = the positive row's
nonzero user features), trained with SIGMOID_RANK loss.  The pair sampling
re-randomizes every pass, so the source exposes ``epoch_dataset()``
returning a freshly sampled PlusDataset; pair *counts* are deterministic,
keeping array shapes (and jit caches) stable across epochs.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .csr import CSRDataset, PlusBlock, PlusDataset
from .batching_plus import merge_split_blocks
from .registry import IteratorConfig


def _merge_diff(pi, pv, ni, nv):
    """Sorted-merge difference features (merge, apex_svd_data.cpp:828-860):
    value = v_pos - v_neg on common indices; entries with zero difference
    are kept, like the reference."""
    all_idx = np.concatenate([pi, ni])
    all_val = np.concatenate([pv, -nv]).astype(np.float32)
    uniq, inv = np.unique(all_idx, return_inverse=True)
    vals = np.zeros(len(uniq), np.float32)
    np.add.at(vals, inv, all_val)
    return uniq.astype(np.uint32), vals


class PairSource:
    """Wraps a user-group dataset; each epoch_dataset() call resamples."""

    def __init__(self, inner: PlusDataset, cfg: IteratorConfig, seed: int = 10):
        self.inner = inner
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.blocks = merge_split_blocks(inner)
        self.rows = inner.rows

    def epoch_dataset(self) -> PlusDataset:
        cfg = self.cfg
        out_blocks: List[PlusBlock] = []
        for blk in self.blocks:
            d = blk.data
            labels = d.labels
            if cfg.rank_sample_method == 0:
                pos_ids = np.nonzero(labels - cfg.pos_sample_lowerb > -1e-6)[0]
                neg_ids = np.nonzero(labels - cfg.neg_sample_upperb < 1e-6)[0]
                if len(pos_ids) == 0 or len(neg_ids) == 0:
                    pairs = []
                else:
                    neg_ids = self.rng.permutation(neg_ids)
                    pos_ids = self.rng.permutation(pos_ids)
                    snum = len(neg_ids) if cfg.rank_sample_num < 0 else cfg.rank_sample_num
                    snum = min(snum, cfg.rank_sample_max)
                    pairs = [
                        (pos_ids[i % len(pos_ids)], neg_ids[i % len(neg_ids)])
                        for i in range(snum)
                    ]
            elif cfg.rank_sample_method == 1:
                pairs = self._sample_cmp(labels)
            else:
                raise ValueError("unknown rank sample method")

            rows = self._gen_rows(d, pairs)
            out_blocks.append(
                PlusBlock(
                    fb_index=blk.fb_index,
                    fb_value=blk.fb_value,
                    data=rows,
                    extend_tag=0,
                )
            )
        return PlusDataset.from_blocks(out_blocks)

    def _sample_cmp(self, labels):
        """Rating-gap sampling (sample_cmp, apex_svd_data.cpp:920-944)."""
        cfg = self.cfg
        order = np.argsort(labels, kind="stable")
        sorted_l = labels[order]
        pairs = []
        for i in self.rng.permutation(len(labels)):
            left = np.searchsorted(sorted_l, labels[i] - cfg.rank_sample_gap, "left")
            right = np.searchsorted(sorted_l, labels[i] + cfg.rank_sample_gap, "left")
            rng_n = left + len(labels) - right
            if rng_n > 0:
                idx = self.rng.randint(rng_n)
                if idx < left:
                    pairs.append((i, order[idx]))  # i rated higher
                else:
                    pairs.append((order[right + idx - left], i))
        return pairs

    def _gen_rows(self, d: CSRDataset, pairs) -> CSRDataset:
        cfg = self.cfg
        labels_out: List[float] = []
        row_ptr = [0]
        fi: List[np.ndarray] = []
        fv: List[np.ndarray] = []

        def emit(g, u, i, label):
            for seg in (g, u, i):
                fi.append(seg[0])
                fv.append(seg[1])
                row_ptr.append(row_ptr[-1] + len(seg[0]))
            labels_out.append(label)

        for p, n in pairs:
            _, pg, pu, pi_ = d.row(int(p))
            _, ng, nu, ni_ = d.row(int(n))
            if cfg.rank_sample_pointwise:
                for row, label in (((pg, pu, pi_), 1.0), ((ng, nu, ni_), 0.0)):
                    g0, u0, i0 = row
                    keep = np.abs(u0[1]) > 1e-6
                    emit(
                        (g0[0], g0[1].astype(np.float32)),
                        (u0[0][keep], u0[1][keep].astype(np.float32)),
                        (i0[0], i0[1].astype(np.float32)),
                        label,
                    )
                continue
            gseg = _merge_diff(pg[0], pg[1], ng[0], ng[1])
            # user segment: positive row's nonzero user features
            keep = np.abs(pu[1]) > 1e-6
            useg = (pu[0][keep], pu[1][keep].astype(np.float32))
            iseg = _merge_diff(pi_[0], pi_[1], ni_[0], ni_[1])
            if cfg.rank_sample_method // 10 == 0:
                label = 1.0
            else:
                label = float(d.labels[int(p)] - d.labels[int(n)])
            emit(gseg, useg, iseg, label)

        index = (
            np.concatenate(fi).astype(np.uint32) if fi else np.zeros(0, np.uint32)
        )
        value = (
            np.concatenate(fv).astype(np.float32) if fv else np.zeros(0, np.float32)
        )
        return CSRDataset(
            labels=np.asarray(labels_out, np.float32),
            row_ptr=np.asarray(row_ptr, np.int32),
            index=index,
            value=value,
        )
