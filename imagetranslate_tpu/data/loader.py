"""Length-bucketed, fixed-shape host batching.

The reference pre-builds whole dynamic-shape batches inside its Dataset
objects under quadratic/cubic "capacity" formulas (dataset.py:118-123 for MT,
234-235 for MASS) — every batch has its own shape, which on TPU would trigger
a recompile per batch. Here sequence lengths round up to a bucket multiple and
row counts are a deterministic function of the bucketed shape, so XLA sees a
small closed set of shapes; short batches pad with dummy rows masked out of
the loss (`row_mask`).

Row-count budgeting keeps the reference's capacity semantics so memory
behavior is comparable:
    rows <= max_batch // (sb + db)                       (dataset.py:120)
    rows <= capacity*1e6 // ((sb^2 + db^2) * db)          (dataset.py:118-119)
for MASS (db := sb):
    rows <= max_batch // (2 * sb)                         (dataset.py:235)
    rows <= capacity*1e6 // (2 * sb^3)                    (dataset.py:234)
"""

from __future__ import annotations

import dataclasses
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def bucket_len(n: int, step: int = 16, minimum: int = 32) -> int:
    return max(minimum, ((n + step - 1) // step) * step)


def get_lex_dict(dict_path: str) -> Dict[int, List[int]]:
    """Parse the --dict lexical dictionary: lines of "src_id cand1 cand2 ..."
    token ids (reference train_image_mt.py:29-36)."""
    lex: Dict[int, List[int]] = {}
    with open(dict_path) as dr:
        for line in dr:
            ids = [int(x) for x in line.strip().split(" ") if x]
            if len(ids) >= 2:
                lex.setdefault(ids[0], []).extend(ids[1:])
    return lex


def lex_proposals(ids: Sequence[int], lex_dict, pad_id: int) -> List[int]:
    """Candidate-translation set for one source row (reference
    get_lex_suggestions, dataset.py:23-27)."""
    out = sorted({c for t in ids for c in lex_dict.get(int(t), ())})
    return out if out else [pad_id]


def pack_proposals(rows: List[List[int]], pad_id: int,
                   step: int = 16) -> np.ndarray:
    width = bucket_len(max(len(r) for r in rows), step)
    arr = np.full((len(rows), width), pad_id, np.int32)
    for i, r in enumerate(rows):
        arr[i, :min(len(r), width)] = r[:width]
    return arr


def _capacity_rows(sb: int, db: int, capacity_mb: int) -> int:
    """The quadratic/cubic activation-memory guard (reference capacity
    formula, dataset.py:118-123). ONE definition: _rows_for and _batch_rows
    must agree on the budget or the quantum round-up silently overrides the
    guard it is gated on."""
    return int(capacity_mb * 1_000_000) // ((sb * sb + db * db) * db)


def _rows_for(sb: int, db: int, max_batch: int, capacity_mb: int,
              min_rows: int = 1, row_quantum: int = 8) -> int:
    by_tokens = max_batch // (sb + db)
    by_capacity = _capacity_rows(sb, db, capacity_mb)
    rows = max(min_rows, min(by_tokens, by_capacity))
    # Quantize row counts down to multiples of `row_quantum` (floor) so the
    # set of (rows, sb, db) shapes stays small; tiny budgets keep exact rows.
    if rows > row_quantum:
        rows = (rows // row_quantum) * row_quantum
    return rows


def _round_up_rows(n: int, row_quantum: int = 8) -> int:
    """Tail batches pad their ROW count up to the quantum: an XLA program
    exists per (rows, sb, db) triple, and on this environment's remote
    compiles an odd-rows tail costs ~30-60 s of compilation to train on a
    handful of real rows (row_mask covers the padding). Measured on the
    sample fa-en recipe: unpadded tails held training to 50 steps in 30
    minutes of mostly compiling."""
    return -(-n // row_quantum) * row_quantum


def _batch_rows(n_real: int, sb: int, db: int, max_batch: int,
                capacity_mb: int) -> int:
    """Total row count for a batch holding n_real real rows. Every batch of
    a bucket gets the same shape (one XLA program per bucket — the compile
    discipline _round_up_rows documents): the bucket's budget row count,
    rounded UP to the 8-row quantum so row counts stay divisible by small
    data-axis mesh sizes (shard_map/PP require even division) — UNLESS the
    quadratic/cubic memory guard forbids it: padding rows cost real
    activation memory, and a quantum floor that overrode the guard would
    OOM exactly the long-sequence shapes it protects (s=512 under default
    budgets allows 2 rows; an unconditional round-up to 8 would run 4x the
    budgeted memory). When the bucket grew past the budget while
    accumulating (min_rows case) the real rows run unpadded."""
    cap = _rows_for(sb, db, max_batch, capacity_mb)
    target = _round_up_rows(cap)
    by_capacity = _capacity_rows(sb, db, capacity_mb)
    if target > by_capacity:
        target = cap  # memory-bound bucket: keep the exact budget rows
    return target if target >= n_real else n_real


@dataclasses.dataclass
class MTBatch:
    src: np.ndarray        # [N, sb] int32
    src_mask: np.ndarray   # [N, sb] bool
    dst: np.ndarray        # [N, db] int32
    dst_mask: np.ndarray   # [N, db] bool
    src_langs: np.ndarray  # [N] language type ids
    dst_langs: np.ndarray  # [N]
    src_sizes: np.ndarray  # [N] true source lengths
    row_mask: np.ndarray   # [N] bool, False for padding rows
    examples: Optional[list] = None  # original (src, dst) id lists, real rows
    proposals: Optional[np.ndarray] = None       # [N, P] --dict candidates
    proposal_mask: Optional[np.ndarray] = None   # [N, P]


class MTBatcher:
    """examples: list of (src_ids, dst_ids, src_lang_type, dst_lang_type)
    already length-sorted by the binarizer."""

    def __init__(self, examples: Sequence[Tuple], pad_id: int = 0,
                 max_batch: int = 4000, capacity_mb: int = 600,
                 max_seq_len: int = 175, bucket_step: int = 16,
                 keep_examples: bool = False, lex_dict=None):
        self.pad_id = pad_id
        self.lex_dict = lex_dict
        self.batches: List[MTBatch] = []
        self._build(examples, max_batch, capacity_mb, max_seq_len, bucket_step,
                    keep_examples)

    def _build(self, examples, max_batch, capacity_mb, max_seq_len,
               bucket_step, keep_examples):
        cur: List[Tuple] = []
        cur_sb = cur_db = 0

        def flush():
            nonlocal cur, cur_sb, cur_db
            if not cur:
                return
            rows = _batch_rows(len(cur), cur_sb, cur_db, max_batch,
                               capacity_mb)
            self.batches.append(self._pack(cur, rows, cur_sb, cur_db,
                                           keep_examples))
            cur, cur_sb, cur_db = [], 0, 0

        for ex in examples:
            src = ex[0][:max_seq_len]
            dst = ex[1][:max_seq_len]
            sb = bucket_len(len(src), bucket_step)
            db = bucket_len(len(dst), bucket_step)
            nsb, ndb = max(cur_sb, sb), max(cur_db, db)
            rows_budget = _rows_for(nsb, ndb, max_batch, capacity_mb)
            if cur and (nsb != cur_sb or ndb != cur_db or
                        len(cur) + 1 > rows_budget):
                flush()
                nsb, ndb = sb, db
            cur.append((src, dst, ex[2], ex[3]))
            cur_sb, cur_db = nsb, ndb
        flush()

    def _pack(self, rows_data, rows, sb, db, keep_examples) -> MTBatch:
        n = len(rows_data)
        src = np.full((rows, sb), self.pad_id, np.int32)
        dst = np.full((rows, db), self.pad_id, np.int32)
        src_langs = np.zeros((rows,), np.int32)
        dst_langs = np.zeros((rows,), np.int32)
        src_sizes = np.ones((rows,), np.int32)
        row_mask = np.zeros((rows,), bool)
        for i, (s, d, sl, dl) in enumerate(rows_data):
            src[i, :len(s)] = s
            dst[i, :len(d)] = d
            src_langs[i], dst_langs[i] = sl, dl
            src_sizes[i] = len(s)
            row_mask[i] = True
        # Padding rows replicate row 0 so the model never sees fully-empty
        # sequences (their loss weight is zero via row_mask anyway).
        if n < rows and n > 0:
            src[n:] = src[0]
            dst[n:] = dst[0]
            src_langs[n:] = src_langs[0]
            dst_langs[n:] = dst_langs[0]
            src_sizes[n:] = src_sizes[0]
        proposals = proposal_mask = None
        if self.lex_dict is not None:
            prop_rows = [lex_proposals(src[i], self.lex_dict, self.pad_id)
                         for i in range(rows)]
            proposals = pack_proposals(prop_rows, self.pad_id)
            proposal_mask = proposals != self.pad_id
        return MTBatch(src, src != self.pad_id, dst, dst != self.pad_id,
                       src_langs, dst_langs, src_sizes, row_mask,
                       examples=[r[:2] for r in rows_data] if keep_examples else None,
                       proposals=proposals, proposal_mask=proposal_mask)

    @classmethod
    def from_packed(cls, reader, pad_id: int = 0, max_batch: int = 4000,
                    capacity_mb: int = 600, max_seq_len: int = 175,
                    bucket_step: int = 16, lex_dict=None) -> "MTBatcher":
        """Build batches straight from an ITR1 PackedReader: the grouping
        loop touches only the O(1)-readable length arrays, and row packing
        runs in C (recordio pack_padded) instead of a per-row Python loop —
        the batch-construction hot path for 6M-example shards."""
        self = cls.__new__(cls)
        self.pad_id = pad_id
        self.lex_dict = lex_dict
        self.batches = []
        ls = np.minimum(reader.lengths(0), max_seq_len).astype(np.int32)
        ld = np.minimum(reader.lengths(1), max_seq_len).astype(np.int32)
        sl_all = reader.scalars(2)
        dl_all = reader.scalars(3)

        def flush(idx, sb, db):
            if not idx:
                return
            n = len(idx)
            rows = _batch_rows(n, sb, db, max_batch, capacity_mb)
            ii = np.asarray(idx, np.int64)
            src = np.full((rows, sb), pad_id, np.int32)
            dst = np.full((rows, db), pad_id, np.int32)
            src[:n] = reader.pack_padded(ii, 0, sb, pad_id)
            dst[:n] = reader.pack_padded(ii, 1, db, pad_id)
            # enforce the max_seq_len truncation exactly (records longer
            # than max_seq_len got cut at the bucketed width by C packing)
            src[:n][np.arange(sb)[None, :] >= ls[ii][:, None]] = pad_id
            dst[:n][np.arange(db)[None, :] >= ld[ii][:, None]] = pad_id
            src_langs = np.zeros((rows,), np.int32)
            dst_langs = np.zeros((rows,), np.int32)
            src_sizes = np.ones((rows,), np.int32)
            row_mask = np.zeros((rows,), bool)
            src_langs[:n] = sl_all[ii]
            dst_langs[:n] = dl_all[ii]
            src_sizes[:n] = ls[ii]
            row_mask[:n] = True
            if n < rows:
                src[n:] = src[0]
                dst[n:] = dst[0]
                src_langs[n:] = src_langs[0]
                dst_langs[n:] = dst_langs[0]
                src_sizes[n:] = src_sizes[0]
            proposals = proposal_mask = None
            if lex_dict is not None:
                prop_rows = [lex_proposals(src[i], lex_dict, pad_id)
                             for i in range(rows)]
                proposals = pack_proposals(prop_rows, pad_id)
                proposal_mask = proposals != pad_id
            self.batches.append(MTBatch(
                src, src != pad_id, dst, dst != pad_id, src_langs, dst_langs,
                src_sizes, row_mask, examples=None, proposals=proposals,
                proposal_mask=proposal_mask))

        cur: List[int] = []
        cur_sb = cur_db = 0
        for i in range(len(reader)):
            sb = bucket_len(int(ls[i]), bucket_step)
            db = bucket_len(int(ld[i]), bucket_step)
            nsb, ndb = max(cur_sb, sb), max(cur_db, db)
            rows_budget = _rows_for(nsb, ndb, max_batch, capacity_mb)
            if cur and (nsb != cur_sb or ndb != cur_db or
                        len(cur) + 1 > rows_budget):
                flush(cur, cur_sb, cur_db)
                cur = []
                nsb, ndb = sb, db
            cur.append(i)
            cur_sb, cur_db = nsb, ndb
        flush(cur, cur_sb, cur_db)
        return self

    def __len__(self):
        return len(self.batches)

    def __iter__(self) -> Iterator[MTBatch]:
        return iter(self.batches)

    def shuffled(self, seed: int) -> Iterator[MTBatch]:
        order = list(range(len(self.batches)))
        random.Random(seed).shuffle(order)
        for i in order:
            yield self.batches[i]


class DocBlockDataset:
    """Block-cached random access over create_batches output (reference
    TextDataset, dataset.py:30-70): `N.pkl` blocks + info.txt header
    "block_size\\tline_num\\tfile_count". Rows are fixed seq_len vectors, so
    batches are trivially fixed-shape.

    Reads all three block layouts: the reference's marshal dict
    {global_line_num: (ids, lang_type)} (create_batches.py:30-48), the
    pre-r5 first-party marshal list of bare id rows, and ITR1 packed blocks
    (1 field = ids, 2 fields = ids + lang_type)."""

    def __init__(self, cache_dir: str, max_cache_size: int = 100,
                 load_all: bool = False):
        import marshal
        import os

        self.cache_dir = cache_dir
        self.max_cache_size = max_cache_size
        self._marshal = marshal
        self._os = os
        with open(os.path.join(cache_dir, "info.txt")) as fr:
            spl = fr.read().strip().split("\t")
            self.sentence_block_size = int(spl[0])
            self.line_num = int(spl[1])
            self.file_count = int(spl[2])
        self.cache: Dict[int, list] = {}
        self._langs: Dict[int, list] = {}
        if load_all:
            self._fill(0, self.file_count)

    @staticmethod
    def _normalize(block):
        """-> (rows, langs). Reference dict blocks carry GLOBAL line-number
        keys (dataset.py:66-70 indexes them globally); sorted keys recover
        block-local order because consecutive line numbers fill each block."""
        if isinstance(block, dict):
            block = [block[k] for k in sorted(block)]
        rows, langs = [], []
        for r in block:
            if (isinstance(r, (tuple, list)) and len(r) == 2
                    and isinstance(r[0], (list, tuple))):
                rows.append(list(r[0]))
                langs.append(int(r[1]))
            else:
                rows.append(list(r))
                langs.append(0)
        return rows, langs

    def _fill(self, start: int, end: int):
        from imagetranslate_tpu.data.recordio import is_packed

        self.cache = {}
        self._langs = {}
        for n in range(start, min(end, self.file_count)):
            path = self._os.path.join(self.cache_dir, f"{n}.pkl")
            if is_packed(path):
                from imagetranslate_tpu.data.recordio import PackedReader

                r = PackedReader(path)
                self.cache[n] = [r.field(i, 0).tolist() for i in range(len(r))]
                if r.n_fields >= 2:
                    self._langs[n] = [int(r.field(i, 1)[0])
                                      for i in range(len(r))]
                else:
                    self._langs[n] = [0] * len(r)
                r.close()
            else:
                with open(path, "rb") as fp:
                    block = self._marshal.load(fp)
                self.cache[n], self._langs[n] = self._normalize(block)

    def __len__(self):
        return self.line_num

    def __getitem__(self, item: int):
        file_num = item // self.sentence_block_size
        if file_num not in self.cache:
            self._fill(file_num, file_num + self.max_cache_size)
        return self.cache[file_num][item % self.sentence_block_size]

    def lang_at(self, item: int) -> int:
        """Language TYPE id stored with the row (reference (ids, lang)
        tuples); 0 for formats that carry none."""
        file_num = item // self.sentence_block_size
        if file_num not in self.cache:
            self._fill(file_num, file_num + self.max_cache_size)
        return self._langs[file_num][item % self.sentence_block_size]

    def batches(self, batch_rows: int, pad_id: int = 0, lang_of=None):
        """Fixed-shape [batch_rows, seq_len] batches; the trailing partial
        batch pads with replicated rows masked out via row_mask. lang_of:
        fn(row_ids) -> language type id; default = the per-row lang stored
        in the binary (reference train_lm.py:58 feeds it as token types)."""
        n = len(self)
        for start in range(0, n, batch_rows):
            idx = list(range(start, min(n, start + batch_rows)))
            rows = [self[i] for i in idx]
            real = len(rows)
            while len(rows) < batch_rows:
                rows.append(rows[0])
                idx.append(idx[0])
            texts = np.asarray(rows, np.int32)
            if lang_of is not None:
                langs = np.array([lang_of(r) for r in rows], np.int32)
            else:
                langs = np.array([self.lang_at(i) for i in idx], np.int32)
            row_mask = np.zeros((batch_rows,), bool)
            row_mask[:real] = True
            yield {"texts": texts, "pad_mask": texts != pad_id,
                   "langs": langs, "row_mask": row_mask}


@dataclasses.dataclass
class MassBatch:
    src: np.ndarray        # [N, S]
    src_mask: np.ndarray   # [N, S]
    langs: np.ndarray      # [N] language type ids
    lang_tokens: np.ndarray  # [N] the row's first token (language token id)
    lengths: np.ndarray    # [N] index of first pad (dataset.py pad_idx)
    row_mask: np.ndarray   # [N]


class MassBatcher:
    """examples: list of (ids, lang_type), length-sorted."""

    def __init__(self, examples: Sequence[Tuple], pad_id: int = 0,
                 max_batch: int = 4000, capacity_mb: int = 600,
                 max_seq_len: int = 512, bucket_step: int = 16):
        self.pad_id = pad_id
        self.batches: List[MassBatch] = []
        cur: List[Tuple] = []
        cur_s = 0

        def rows_for(s):
            # MASS capacity formula == _rows_for with sb = db = s
            # (2·s³ capacity, 2·s token budget — dataset.py:234-235).
            return _rows_for(s, s, max_batch, capacity_mb)

        def flush():
            nonlocal cur, cur_s
            if not cur:
                return
            rows = _batch_rows(len(cur), cur_s, cur_s, max_batch,
                               capacity_mb)
            self.batches.append(self._pack(cur, rows, cur_s))
            cur, cur_s = [], 0

        for ex in examples:
            ids = ex[0]
            if len(ids) > max_seq_len:
                continue
            s = bucket_len(len(ids), bucket_step)
            ns = max(cur_s, s)
            if cur and (ns != cur_s or len(cur) + 1 > rows_for(ns)):
                flush()
                ns = s
            cur.append(ex)
            cur_s = ns
        flush()

    @classmethod
    def from_packed(cls, reader, pad_id: int = 0, max_batch: int = 4000,
                    capacity_mb: int = 600, max_seq_len: int = 512,
                    bucket_step: int = 16) -> "MassBatcher":
        """C-packed batch construction from an ITR1 shard (see
        MTBatcher.from_packed)."""
        self = cls.__new__(cls)
        self.pad_id = pad_id
        self.batches = []
        lens = reader.lengths(0).astype(np.int32)
        langs_all = reader.scalars(1)

        def rows_for(s):
            return _rows_for(s, s, max_batch, capacity_mb)

        def flush(idx, s):
            if not idx:
                return
            n = len(idx)
            rows = _batch_rows(n, s, s, max_batch, capacity_mb)
            ii = np.asarray(idx, np.int64)
            src = np.full((rows, s), pad_id, np.int32)
            src[:n] = reader.pack_padded(ii, 0, s, pad_id)
            langs = np.zeros((rows,), np.int32)
            lengths = np.ones((rows,), np.int32)
            row_mask = np.zeros((rows,), bool)
            langs[:n] = langs_all[ii]
            lengths[:n] = lens[ii]
            row_mask[:n] = True
            if n < rows:
                src[n:] = src[0]
                langs[n:] = langs[0]
                lengths[n:] = lengths[0]
            self.batches.append(MassBatch(src, src != pad_id, langs,
                                          src[:, 0].copy(), lengths,
                                          row_mask))

        cur: List[int] = []
        cur_s = 0
        for i in range(len(reader)):
            if int(lens[i]) > max_seq_len:
                continue
            s = bucket_len(int(lens[i]), bucket_step)
            ns = max(cur_s, s)
            if cur and (ns != cur_s or len(cur) + 1 > rows_for(ns)):
                flush(cur, cur_s)
                cur = []
                ns = s
            cur.append(i)
            cur_s = ns
        flush(cur, cur_s)
        return self

    def _pack(self, rows_data, rows, s) -> MassBatch:
        n = len(rows_data)
        src = np.full((rows, s), self.pad_id, np.int32)
        langs = np.zeros((rows,), np.int32)
        lengths = np.ones((rows,), np.int32)
        row_mask = np.zeros((rows,), bool)
        for i, (ids, lt) in enumerate(rows_data):
            src[i, :len(ids)] = ids
            langs[i] = lt
            lengths[i] = len(ids)
            row_mask[i] = True
        if n < rows and n > 0:
            src[n:] = src[0]
            langs[n:] = langs[0]
            lengths[n:] = lengths[0]
        return MassBatch(src, src != self.pad_id, langs, src[:, 0].copy(),
                         lengths, row_mask)

    def __len__(self):
        return len(self.batches)

    def __iter__(self) -> Iterator[MassBatch]:
        return iter(self.batches)

    def shuffled(self, seed: int) -> Iterator[MassBatch]:
        order = list(range(len(self.batches)))
        random.Random(seed).shuffle(order)
        for i in order:
            yield self.batches[i]
