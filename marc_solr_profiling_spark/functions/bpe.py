"""Real-vocab byte-pair-encoding tokenization: load a (vocab, merges)
pair and run the standard rank-based merge loop, vectorized over the
corpus via Arrow batches with per-unique-piece memoization.

This is the exact-count upgrade over ``textstats.bpe_token_count`` (the
GPT-2-style pre-tokenizer PIECE count, which lower-bounds real tokens):
shard packing (``operators/sampling.py``) and temperature rebalancing
denominate budgets in tokens, and approximate counts skew both.

Algorithm (the public BPE encode used by GPT-2/RoBERTa and SentencePiece
in BPE mode):

1. pre-tokenize text into pieces with ``textstats.BPE_SPLIT_RE``
   (leftmost-first alternation — identical in Spark's Java regex and
   DuckDB's RE2, so oracle twins agree);
2. map each piece's bytes through the GPT-2 byte->unicode table
   (printable ASCII maps to itself, space to ``Ġ`` etc.) when
   ``byte_level=True``;
3. repeatedly merge the lowest-rank adjacent symbol pair present until
   no merge applies; the token count is the final symbol count.

Scale shape: the merge loop is Python, but it runs once per DISTINCT
piece per Arrow batch (Zipf's law makes the memo hit rate enormous on
web text), and the memo persists for the lifetime of the Python worker
via a module-level cache keyed by the merges fingerprint — the hot path
over a 100 TB corpus is a dict lookup per piece, not a merge loop.

For a learned merge list (every pair's constituents are produced by
strictly earlier merges — true of ANY merges file emitted by BPE
training), applying merges once in rank order with leftmost
non-overlapping replacement is equivalent to the
pick-lowest-rank-present loop: a merge can only CREATE adjacencies that
involve its own (later-ranked) output, never resurrect an earlier pair.
That equivalence is what lets the DuckDB oracle express a pinned vocab
as a rank-ordered ``replace()`` chain (``tiny_vocab_oracle_expr``), and
it is property-tested against the loop implementation in
``tests/test_bpe.py``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Iterator, List, Sequence, Tuple

from pyspark.sql import DataFrame

from .textstats import BPE_SPLIT_RE


def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte -> unicode-char table (public algorithm):
    printable bytes map to themselves, the rest to U+0100.. offsets."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class BPETokenizer:
    """Encode-only BPE tokenizer from a (vocab, merges) pair.

    ``vocab``: token string -> id (ids are only used by :meth:`encode`;
    counting needs just the merges).  ``merges``: pairs in rank order
    (rank = learn order, lower merges first).  ``byte_level``: route
    piece bytes through the GPT-2 byte->unicode table first (exact GPT-2
    semantics); off = plain character-level BPE."""

    def __init__(self, vocab: Dict[str, int],
                 merges: Sequence[Tuple[str, str]],
                 byte_level: bool = True):
        self.vocab = dict(vocab)
        self.ranks: Dict[Tuple[str, str], int] = {
            tuple(m): i for i, m in enumerate(merges)
        }
        self.byte_level = byte_level
        self._byte_map = bytes_to_unicode() if byte_level else None
        self._memo: Dict[str, Tuple[str, ...]] = {}

    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str,
                   byte_level: bool = True) -> "BPETokenizer":
        """Load the standard GPT-2-format pair: ``vocab_json`` (token ->
        id) + ``merges_txt`` (one ``left right`` pair per line, optional
        ``#version`` header)."""
        import json

        with open(vocab_json) as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        with open(merges_txt) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
        return cls(vocab, merges, byte_level=byte_level)

    def _merge_piece(self, piece: str) -> Tuple[str, ...]:
        got = self._memo.get(piece)
        if got is not None:
            return got
        if self.byte_level:
            bm = self._byte_map
            word: List[str] = [bm[b] for b in piece.encode("utf-8")]
        else:
            word = list(piece)
        ranks = self.ranks
        while len(word) > 1:
            # lowest-rank adjacent pair present
            best_rank, best_pair = None, None
            prev = word[0]
            for cur in word[1:]:
                r = ranks.get((prev, cur))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (prev, cur)
                prev = cur
            if best_pair is None:
                break
            a, b = best_pair
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        out = tuple(word)
        self._memo[piece] = out
        return out

    def tokenize(self, text: str) -> List[str]:
        """Token strings (post-merge symbols) for ``text``."""
        import re

        out: List[str] = []
        for piece in re.findall(BPE_SPLIT_RE, text):
            out.extend(self._merge_piece(piece))
        return out

    def encode(self, text: str) -> List[int]:
        """Token ids; symbols missing from the vocab fall back to -1
        (a learned (vocab, merges) pair never produces one)."""
        return [self.vocab.get(t, -1) for t in self.tokenize(text)]

    def count(self, text: str) -> int:
        import re

        return sum(
            len(self._merge_piece(p)) for p in re.findall(BPE_SPLIT_RE, text)
        )


# ---------------------------------------------------------------------------
# Pinned tiny vocab: the oracle-checkable instance
# ---------------------------------------------------------------------------

#: rank-ordered merges over byte-level symbols (``Ġ`` = space).  Every
#: pair's constituents are base symbols or earlier merge outputs — the
#: learned-merges invariant the replace-chain oracle relies on.
TINY_MERGES: Tuple[Tuple[str, str], ...] = (
    ("t", "h"),        # th
    ("Ġ", "t"),        # Ġt
    ("Ġt", "h"),       # Ġth
    ("th", "e"),       # the
    ("Ġth", "e"),      # Ġthe
    ("i", "n"),        # in
    ("a", "n"),        # an
    ("o", "n"),        # on
    ("e", "r"),        # er
    ("r", "e"),        # re
    ("Ġ", "a"),        # Ġa
    ("an", "d"),       # and
    ("Ġa", "n"),       # Ġan
    ("Ġan", "d"),      # Ġand
    ("o", "f"),        # of
    ("Ġ", "o"),        # Ġo
    ("Ġo", "f"),       # Ġof
    ("in", "g"),       # ing
    ("e", "d"),        # ed
    ("Ġ", "s"),        # Ġs
)

_TINY_SYMBOLS = [a + b for a, b in TINY_MERGES]


def tiny_tokenizer() -> BPETokenizer:
    """The pinned-vocab tokenizer behind the ``bpe_tokens`` oracle row."""
    base = [chr(c) for c in range(0x21, 0x7F)] + ["Ġ"]
    vocab = {s: i for i, s in enumerate(base + _TINY_SYMBOLS)}
    return BPETokenizer(vocab, TINY_MERGES, byte_level=True)


def tiny_vocab_oracle_expr(col: str) -> str:
    """ANSI-SQL (DuckDB) twin of ``tiny_tokenizer().count(col)`` for
    ASCII text: map space to ``Ġ`` per piece, apply the merges as a
    rank-ordered replace chain (each output a single placeholder char),
    and count the remaining symbols with ``length``.  Valid because the
    merge list satisfies the learned-merges invariant (see module
    docstring)."""
    # placeholder chars for merge outputs: circled digits/letters region,
    # guaranteed absent from ASCII input
    placeholder = {s: chr(0x2460 + i) for i, s in enumerate(_TINY_SYMBOLS)}

    def sym(s: str) -> str:
        # a merge operand is a base char or an earlier merge's placeholder
        return placeholder.get(s, s)

    chain = "replace(p, ' ', 'Ġ')"
    for (a, b), out in zip(TINY_MERGES, _TINY_SYMBOLS):
        pat = (sym(a) + sym(b)).replace("'", "''")
        chain = f"replace({chain}, '{pat}', '{placeholder[out]}')"
    sql_re = BPE_SPLIT_RE.replace("'", "''")
    return (
        "coalesce(list_sum(list_transform("
        f"regexp_extract_all({col}, '{sql_re}'), "
        f"p -> length({chain}))), 0)::BIGINT"
    )


# ---------------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------------


@lru_cache(maxsize=4)
def _worker_tokenizer(merges_key: Tuple[Tuple[str, str], ...],
                      byte_level: bool) -> BPETokenizer:
    """Per-Python-worker tokenizer cache: the piece memo survives across
    Arrow batches and tasks, so hot pieces merge once per executor."""
    return BPETokenizer({}, merges_key, byte_level=byte_level)


def with_bpe_token_count(docs: DataFrame, tokenizer: BPETokenizer,
                         text_col: str = "text",
                         out_col: str = "bpe_tokens") -> DataFrame:
    """Add an exact BPE token count column.  Arrow-batched mapInPandas;
    the merge loop runs once per distinct piece per worker (memoized),
    everything else is vectorized pandas string ops.  Zero shuffle."""
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import LongType, StructField, StructType

    merges_key = tuple(sorted(tokenizer.ranks, key=tokenizer.ranks.get))
    byte_level = tokenizer.byte_level
    # fresh StructType — StructType.add mutates in place, which would
    # corrupt the source DataFrame's cached schema
    schema = StructType(
        list(docs.schema.fields) + [StructField(out_col, LongType())]
    )
    cols = list(docs.columns)
    t_ix = cols.index(text_col)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import re

        tok = _worker_tokenizer(merges_key, byte_level)
        pat = re.compile(BPE_SPLIT_RE)
        merge = tok._merge_piece
        for pdf in batches:
            texts = pdf.iloc[:, t_ix]
            counts = [
                sum(len(merge(p)) for p in pat.findall(t))
                if isinstance(t, str) else 0
                for t in texts
            ]
            out = pdf.copy()
            out[out_col] = counts
            yield out

    return docs.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# BPE TRAINING (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
# of Rare Words with Subword Units", Algorithm 1) — learn the merges from
# the corpus instead of loading a pretrained pair.
# ---------------------------------------------------------------------------

def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The ONE corpus pass of BPE training: pre-tokenize with the shared
    ``BPE_SPLIT_RE`` and count distinct pieces — ``(w, c)``. Everything
    after this operates on the word-frequency table, whose size is
    bounded by the pre-tokenizer vocabulary (Zipf: ~1e7-1e8 distinct
    pieces at web scale), never by the corpus."""
    from pyspark.sql import functions as F

    return docs.select(
        F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0)
        )).alias("w")
    ).groupBy("w").agg(F.count("*").alias("c"))


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol-pair counts for the FIRST training round
    (symbols = characters), distributed: ``(pair, cnt)``. This is the
    per-round aggregation of a fully-distributed trainer, exposed for
    the oracle contract; :func:`train_bpe_merges` runs the loop on the
    collected heavy-hitter table instead (see its scale note)."""
    from pyspark.sql import functions as F

    return words.filter(F.length("w") >= 2).select(
        F.explode(F.expr(
            "transform(sequence(1, length(w) - 1), "
            "i -> concat(substring(w, i, 1), ' ', substring(w, i + 1, 1)))"
        )).alias("pair"),
        F.col("c"),
    ).groupBy("pair").agg(F.sum("c").cast("long").alias("cnt"))


def train_bpe_merges(docs: DataFrame, n_merges: int = 50,
                     text_col: str = "text", min_count: int = 2,
                     top_k: int = 100_000,
                     byte_level: bool = False) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Deterministic
    tie-break: highest weighted count, then lexicographically smallest
    pair — so the learned merges are reproducible across runs and
    partitionings.

    Scale shape: the corpus is touched ONCE (:func:`word_freq_table`,
    the only full-volume shuffle); the merge loop then runs over the
    top-``top_k``-by-count word table collected to the driver — the
    same driver-sized-side-input pattern as the k-means centroids,
    eval-set hashes and LM model arrays. The cutoff is principled, not
    a shortcut: pair mass is dominated by head words (Zipf), Sennrich's
    reference implementation trains on exactly this word-frequency
    dict, and tail words below ``min_count`` cannot win a merge round
    against head pairs. A fully-distributed per-round variant is one
    :func:`bpe_pair_counts`-shaped aggregation per merge over the
    words table (kept distributed) — the upgrade path if ``top_k``
    must be unbounded.

    Returns merges in rank order, directly consumable by
    :class:`BPETokenizer` (every pair's constituents are produced by
    strictly earlier merges, the property the encode loop relies on).
    """
    from pyspark.sql import functions as F

    wf = word_freq_table(docs, text_col).filter(F.col("c") >= min_count)
    rows = (wf.orderBy(F.desc("c"), F.asc("w")).limit(top_k)).collect()

    b2u = bytes_to_unicode() if byte_level else None
    seqs: List[List[str]] = []
    weights: List[int] = []
    for r in rows:
        w = r["w"]
        if byte_level:
            w = "".join(b2u[b] for b in w.encode("utf-8"))
        if len(w) < 2:
            continue
        seqs.append(list(w))
        weights.append(int(r["c"]))

    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Dict[Tuple[str, str], int] = {}
        for syms, c in zip(seqs, weights):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for syms in seqs:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def tokenizer_from_corpus(docs: DataFrame, n_merges: int = 50,
                          text_col: str = "text", min_count: int = 2,
                          byte_level: bool = False) -> BPETokenizer:
    """Train merges on the corpus and wrap them as a
    :class:`BPETokenizer` (vocab = all symbols reachable from the
    merges; ids in deterministic sorted order)."""
    merges = train_bpe_merges(docs, n_merges, text_col,
                              min_count=min_count, byte_level=byte_level)
    toks = set()
    for a, b in merges:
        toks.update((a, b, a + b))
    vocab = {t: i for i, t in enumerate(sorted(toks))}
    return BPETokenizer(vocab, merges, byte_level=byte_level)
