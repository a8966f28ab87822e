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
        # whole-epoch synthesis operands (epoch_dataset fast path): one
        # concatenated row CSR + per-block row offsets, and the epoch-
        # invariant feedback pool laid out once
        self._rows_cat = CSRDataset.concat([b.data for b in self.blocks])
        sizes = np.array([b.data.num_row for b in self.blocks], np.int64)
        self._row_starts = np.cumsum(sizes) - sizes
        self._fb_index = (
            np.concatenate([b.fb_index for b in self.blocks])
            if self.blocks else np.zeros(0, np.uint32)
        )
        self._fb_value = (
            np.concatenate([b.fb_value for b in self.blocks])
            if self.blocks else np.zeros(0, np.float32)
        )
        nf = np.array([b.num_ufeedback for b in self.blocks], np.int64)
        self._block_fb_ptr = np.concatenate([[0], np.cumsum(nf)]).astype(np.int32)

    def _sample_block(self, labels):
        """One block's (pos_row, neg_row) sample arrays — block-local ids.
        rng call order matches the reference exactly (neg permuted before
        pos, no rng touch on empty blocks, apex_svd_data.cpp:897-918)."""
        cfg = self.cfg
        if cfg.rank_sample_method == 0:
            pos_ids = np.nonzero(labels - cfg.pos_sample_lowerb > -1e-6)[0]
            neg_ids = np.nonzero(labels - cfg.neg_sample_upperb < 1e-6)[0]
            if len(pos_ids) == 0 or len(neg_ids) == 0:
                return (np.zeros(0, np.int64),) * 2
            neg_ids = self.rng.permutation(neg_ids)
            pos_ids = self.rng.permutation(pos_ids)
            snum = len(neg_ids) if cfg.rank_sample_num < 0 else cfg.rank_sample_num
            snum = min(snum, cfg.rank_sample_max)
            # cyclic fill == (i % len) pairing of the two permutations
            return (
                np.resize(pos_ids, snum).astype(np.int64),
                np.resize(neg_ids, snum).astype(np.int64),
            )
        elif cfg.rank_sample_method == 1:
            pairs = self._sample_cmp(labels)
            if not pairs:
                return (np.zeros(0, np.int64),) * 2
            arr = np.asarray(pairs, np.int64)
            return arr[:, 0], arr[:, 1]
        raise ValueError("unknown rank sample method")

    def epoch_pairs(self):
        """One epoch's (pos_row, neg_row) sample in whole-dataset row ids,
        plus per-block pair counts (deterministic across epochs).  Advances
        the rng exactly like epoch_dataset — the two are interchangeable
        views of the same sample stream."""
        prs: List[np.ndarray] = []
        nrs: List[np.ndarray] = []
        counts = np.zeros(len(self.blocks), np.int64)
        for b, blk in enumerate(self.blocks):
            r0 = self._row_starts[b]
            n = blk.data.num_row
            pr, nr = self._sample_block(self._rows_cat.labels[r0 : r0 + n])
            counts[b] = len(pr)
            if len(pr):
                prs.append(pr + r0)
                nrs.append(nr + r0)
        if prs:
            return np.concatenate(prs), np.concatenate(nrs), counts
        return np.zeros(0, np.int64), np.zeros(0, np.int64), counts

    def pair_geometry(self):
        """Static method-0 sampling geometry (epoch-invariant, cached):
        the positive/negative candidate sets in block-contiguous order,
        per-candidate block starts, and the pair -> candidate-position
        maps of the cyclic fill.  Everything about an epoch's sample
        except the two permutations — the operands of sample_offsets()
        and of device-side plane assembly
        (solvers/svdpp._pair_multi_train)."""
        if getattr(self, "_pair_geo", None) is not None:
            return self._pair_geo
        cfg = self.cfg
        labels = self._rows_cat.labels
        NB = len(self.blocks)
        sizes = np.array([b.data.num_row for b in self.blocks], np.int64)
        blk = np.repeat(np.arange(NB, dtype=np.int64), sizes)
        rows = np.arange(len(labels), dtype=np.int64)
        pos_mask = labels - cfg.pos_sample_lowerb > -1e-6
        neg_mask = labels - cfg.neg_sample_upperb < 1e-6
        pos_rows, pos_blk = rows[pos_mask], blk[pos_mask]
        neg_rows, neg_blk = rows[neg_mask], blk[neg_mask]
        P_b = np.bincount(pos_blk, minlength=NB)
        N_b = np.bincount(neg_blk, minlength=NB)
        live = (P_b > 0) & (N_b > 0)
        snum = (
            N_b if cfg.rank_sample_num < 0
            else np.full(NB, cfg.rank_sample_num, np.int64)
        )
        snum = np.where(live, np.minimum(snum, cfg.rank_sample_max), 0)
        pstart = np.cumsum(P_b) - P_b
        nstart = np.cumsum(N_b) - N_b
        sstart = np.cumsum(snum) - snum
        bb = np.repeat(np.arange(NB), snum)
        jj = np.arange(int(snum.sum()), dtype=np.int64) - sstart[bb]
        self._pair_geo = dict(
            pos_rows=pos_rows.astype(np.int32),
            neg_rows=neg_rows.astype(np.int32),
            # block start of each candidate POSITION (positions are
            # block-contiguous, so this is also the local-offset base)
            pstart_elem=pstart[pos_blk].astype(np.int32),
            nstart_elem=nstart[neg_blk].astype(np.int32),
            # pair s -> candidate position (cyclic fill, j % count)
            jp=(pstart[bb] + jj % np.maximum(P_b[bb], 1)).astype(np.int32),
            jn=(nstart[bb] + jj % np.maximum(N_b[bb], 1)).astype(np.int32),
            P_b=P_b,
            N_b=N_b,
            # smallest dtype that fits the largest block-local offset:
            # the offset planes are the dominant per-dispatch tunnel
            # transfer of the multi-round path (~3 MB/K-block on
            # ML-100K), so uint8 halves it again when every block has
            # < 256 candidates (e.g. the bigRank 3N shape)
            off_dtype=(
                np.uint8
                if max(P_b.max(initial=0), N_b.max(initial=0)) < (1 << 8)
                else np.uint16
                if max(P_b.max(initial=0), N_b.max(initial=0)) < (1 << 16)
                else np.int32
            ),
        )
        return self._pair_geo

    def sample_offsets(self, n_rounds: int, rng):
        """``n_rounds`` epochs of method-0 sampling, as block-LOCAL
        permutation offsets: round r, candidate position p holds the
        local index of the candidate that round r's permutation places
        at p.  Law-equivalent to _sample_block (same thresholds, one
        uniform permutation per (round, block, set), cyclic fill) but a
        different stream: positions are keyed by iid uniforms and sorted
        in one batched argsort instead of ~2 RandomState.permutation
        calls per block — ~6x less host time per round, which is what
        keeps the one-ahead producer thread faster than the device epoch
        (solvers/svdpp._train_pair_rounds_host).  Per-position rank
        parity with the reference never holds anyway (its PRNG differs);
        the P@20 metric is the contract (tests/test_golden_full.py)."""
        geo = self.pair_geometry()
        P, N = len(geo["pos_rows"]), len(geo["neg_rows"])
        dt = geo["off_dtype"]

        from .native import block_shuffle_native

        # native batched Fisher-Yates: O(n) per round and spike-free vs
        # the argsort fallback's O(n log n) (measured 70-600 ms per 8
        # rounds on the ML-100K rank workload; the spikes starved the
        # device).  Same law (uniform per-block permutations), different
        # stream — as documented above, the stream is not a contract.
        # the native plane is uint16 or int32; uint8 (every block < 256
        # candidates) narrows on the host — the cast is cheap next to
        # the tunnel bytes it halves
        elem16 = dt in (np.uint16, np.uint8)
        opl = block_shuffle_native(
            geo["P_b"], n_rounds, int(rng.integers(1 << 63)), elem16
        )
        if opl is not None:
            onl = block_shuffle_native(
                geo["N_b"], n_rounds, int(rng.integers(1 << 63)), elem16
            )
            if dt == np.uint8:
                opl = opl.astype(np.uint8)
                onl = onl.astype(np.uint8)
            return opl, onl

        def perm(base, count):
            # key = block + u sorts within blocks (block segments stay
            # contiguous); subtracting the per-position base yields the
            # block-local offsets directly
            key = base[None, :] + rng.random((n_rounds, count))
            return (np.argsort(key, axis=1) - base[None, :]).astype(dt)

        return (
            perm(geo["pstart_elem"].astype(np.float64), P),
            perm(geo["nstart_elem"].astype(np.float64), N),
        )

    def epoch_dataset(self) -> PlusDataset:
        cfg = self.cfg
        # legacy per-block path: pointwise emission or a test-overridden
        # per-block _gen_rows
        if cfg.rank_sample_pointwise or "_gen_rows" in self.__dict__:
            return self._epoch_dataset_blocks()
        # fast path: sample per block (sequential rng), synthesize every
        # pair row of the epoch in ONE vectorized pass over the whole CSR
        pr, nr, counts = self.epoch_pairs()
        if len(pr):
            rows = self._gen_rows_arrays(self._rows_cat, pr, nr)
        else:
            rows = CSRDataset(
                labels=np.zeros(0, np.float32),
                row_ptr=np.zeros(1, np.int32),
                index=np.zeros(0, np.uint32),
                value=np.zeros(0, np.float32),
            )
        block_row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        return PlusDataset(
            rows=rows,
            fb_index=self._fb_index,
            fb_value=self._fb_value,
            block_row_ptr=block_row_ptr,
            block_fb_ptr=self._block_fb_ptr,
            extend_tag=np.zeros(len(self.blocks), np.int8),
        )

    def _epoch_dataset_blocks(self) -> PlusDataset:
        out_blocks: List[PlusBlock] = []
        for b, blk in enumerate(self.blocks):
            d = blk.data
            pr, nr = self._sample_block(d.labels)
            pairs = list(zip(pr.tolist(), nr.tolist()))
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
        """Vectorized pair-row synthesis (the per-epoch hot path: the
        device trains a round in milliseconds, so the resampling must not
        cost seconds).  Entry-for-entry identical to _gen_rows_ref —
        sorted-unique merge order, zero-diff entries kept — pinned by
        tests/test_rank.py; the reference emits the same merge order
        (apex_svd_data.cpp:828-860)."""
        cfg = self.cfg
        if cfg.rank_sample_pointwise or not pairs:
            return self._gen_rows_ref(d, pairs)
        P = len(pairs)
        pr = np.fromiter((p for p, _ in pairs), np.int64, P)
        nr = np.fromiter((n for _, n in pairs), np.int64, P)
        return self._gen_rows_arrays(d, pr, nr)

    def _gen_rows_arrays(self, d: CSRDataset, pr, nr) -> CSRDataset:
        """Array-operand core of _gen_rows: works on any CSR row space, so
        the whole epoch (all blocks) synthesizes in one call."""
        cfg = self.cfg
        P = len(pr)
        rp = d.row_ptr.astype(np.int64)
        idx_all, val_all = d.index, d.value
        if cfg.rank_sample_method // 10 == 0:
            labels = np.ones(P, np.float32)
        else:
            labels = (d.labels[pr] - d.labels[nr]).astype(np.float32)

        def expand(rows, s, sign):
            """All (pair, idx, sign*val) entries of segment s of rows."""
            a = rp[3 * rows + s]
            lens = (rp[3 * rows + s + 1] - a).astype(np.int64)
            tot = int(lens.sum())
            starts = np.cumsum(lens) - lens
            pos = np.repeat(a - starts, lens) + np.arange(tot)
            return (
                np.repeat(np.arange(P, dtype=np.int64), lens),
                idx_all[pos].astype(np.int64),
                (sign * val_all[pos]).astype(np.float32),
            )

        def merged(s):
            """Per-pair sorted-unique diff merge of segment s (value =
            v_pos - v_neg on common ids, zero differences kept)."""
            r1, i1, v1 = expand(pr, s, 1.0)
            r2, i2, v2 = expand(nr, s, -1.0)
            r = np.concatenate([r1, r2])
            i = np.concatenate([i1, i2])
            v = np.concatenate([v1, v2])
            order = np.lexsort((i, r))
            r, i, v = r[order], i[order], v[order]
            first = np.ones(len(r), bool)
            if len(r) > 1:
                first[1:] = (r[1:] != r[:-1]) | (i[1:] != i[:-1])
            grp = np.cumsum(first) - 1
            sv = np.zeros(int(first.sum()), np.float32)
            np.add.at(sv, grp, v)
            return r[first], i[first], sv

        gr, gi, gv = merged(0)
        ir, ii, iv = merged(2)
        ur, ui, uv = expand(pr, 1, 1.0)
        keep = np.abs(uv) > 1e-6
        ur, ui, uv = ur[keep], ui[keep], uv[keep]

        cnt = np.zeros((P, 3), np.int64)
        cnt[:, 0] = np.bincount(gr, minlength=P)
        cnt[:, 1] = np.bincount(ur, minlength=P)
        cnt[:, 2] = np.bincount(ir, minlength=P)
        row_ptr = np.zeros(3 * P + 1, np.int64)
        np.cumsum(cnt.reshape(-1), out=row_ptr[1:])
        index = np.zeros(int(row_ptr[-1]), np.uint32)
        value = np.zeros(int(row_ptr[-1]), np.float32)
        for s, (r, i, v) in enumerate(((gr, gi, gv), (ur, ui, uv), (ir, ii, iv))):
            c = cnt[:, s]
            starts = np.cumsum(c) - c  # first position of each pair's run
            dest = np.repeat(row_ptr[3 * np.arange(P) + s] - starts, c) + np.arange(
                len(r)
            )
            index[dest] = i
            value[dest] = v
        return CSRDataset(
            labels=labels,
            row_ptr=row_ptr.astype(np.int32),
            index=index,
            value=value,
        )

    def _gen_rows_ref(self, d: CSRDataset, pairs) -> CSRDataset:
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
