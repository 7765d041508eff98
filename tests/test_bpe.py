"""Real-vocab BPE (functions/bpe.py): the merge loop vs hand-computed
merges, the GPT-2 files loader, the replace-chain oracle equivalence
(via DuckDB), and the Spark mapInPandas surface."""

from __future__ import annotations

import json
import random

import duckdb
import pytest

from marc_solr_profiling_spark.functions.bpe import (
    BPETokenizer,
    TINY_MERGES,
    bytes_to_unicode,
    tiny_tokenizer,
    tiny_vocab_oracle_expr,
    with_bpe_token_count,
)


def test_bytes_to_unicode_table():
    bm = bytes_to_unicode()
    assert len(bm) == 256 and len(set(bm.values())) == 256  # reversible
    assert bm[ord("a")] == "a" and bm[ord("!")] == "!"
    assert bm[ord(" ")] == "Ġ"
    assert bm[ord("\n")] == "Ċ"


def test_hand_computed_merges():
    tok = tiny_tokenizer()
    # " the" -> Ġ,t,h,e: (t,h) r0 beats (Ġ,t) r1 -> Ġ,th,e -> (th,e) r3
    # -> Ġ,the; no (Ġ,the) merge exists (r4 is ("Ġth","e"), whose left
    # operand can only form when r1 fires first — a dead merge here, as
    # happens in real learned lists)
    assert tok.tokenize(" the") == ["Ġ", "the"]
    assert tok.tokenize("the") == ["the"]
    # "Ġt" does form when not followed by 'h'
    assert tok.tokenize(" to") == ["Ġt", "o"]
    # " thin": (t,h) r0 wins over (Ġ,t) r1 -> Ġ,th,i,n -> (i,n) r5
    # -> Ġ,th,in; no pair left
    assert tok.tokenize(" thin") == ["Ġ", "th", "in"]
    # " and" -> Ġ,a,n,d: (a,n) r6 beats (Ġ,a) r10 -> Ġ,an,d ->
    # (an,d) r11 -> Ġ,and ... wait (Ġ,an)? r12 requires symbol Ġa. Check:
    # pairs now (Ġ,an)=r12? TINY_MERGES[12] is ("Ġa","n"), NOT (Ġ,an) —
    # so (an,d) r11 -> Ġ,and; (Ġ,and)=r13? that's ("Ġan","d") — no.
    assert tok.tokenize(" and") == ["Ġ", "and"]
    assert tok.count(" the thin and") == 2 + 3 + 2
    # unknown symbols stay single tokens
    assert tok.tokenize("zq") == ["z", "q"]
    # ids: every emitted symbol is in the tiny vocab (no -1)
    assert -1 not in tok.encode(" the thin and of thered")


def test_count_matches_tokenize_len():
    tok = tiny_tokenizer()
    for s in ["", " ", "the the the", "a1b2!?", "  double  spaces",
              "it's the er on in of and"]:
        assert tok.count(s) == len(tok.tokenize(s))


def test_from_files_loader(tmp_path):
    vocab = {"a": 0, "b": 1, "ab": 2, "Ġ": 3}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\na b\n")
    tok = BPETokenizer.from_files(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    assert tok.tokenize("abab") == ["ab", "ab"]
    assert tok.encode("ab") == [2]


def test_oracle_replace_chain_equivalence_random():
    """The DuckDB replace-chain twin equals the merge-loop tokenizer on
    random ASCII text — the equivalence the bpe_tokens oracle row rests
    on (valid for learned merge lists; TINY_MERGES is one)."""
    tok = tiny_tokenizer()
    rng = random.Random(42)
    alphabet = "the andofinger s!,.0123xyz   "
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(80)))
             for _ in range(300)]
    texts += ["", " ", "the", " the", "thethethe", "it's", "a's t",
              "in inging anand ther"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(texts)))
    expr = tiny_vocab_oracle_expr("text")
    got = dict(con.execute(
        f"SELECT doc_id, {expr} FROM t ORDER BY doc_id").fetchall())
    for i, s in enumerate(texts):
        assert got[i] == tok.count(s), (i, s)


def test_merge_loop_vs_bruteforce_property():
    """The production merge loop (lowest-rank-present, leftmost
    non-overlapping) vs an independent brute-force that re-scans from
    scratch after every single merge."""
    ranks = {m: i for i, m in enumerate(TINY_MERGES)}
    bm = bytes_to_unicode()

    def brute(piece: str) -> list[str]:
        word = [bm[b] for b in piece.encode()]
        while True:
            best = None
            for i in range(len(word) - 1):
                r = ranks.get((word[i], word[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, word[i], word[i + 1])
            if best is None:
                return word
            _, a, b = best
            # merge the LEFTMOST occurrence only, then rescan
            for i in range(len(word) - 1):
                if word[i] == a and word[i + 1] == b:
                    word[i:i + 2] = [a + b]
                    break

    tok = tiny_tokenizer()
    rng = random.Random(7)
    for _ in range(500):
        piece = "".join(rng.choice("theandofings ") for _ in
                        range(rng.randrange(1, 14)))
        assert tok._merge_piece(piece) == tuple(brute(piece)), piece


def test_pack_shards_on_exact_bpe_counts(spark):
    """Budget shard packing denominated in EXACT BPE tokens — the
    composition the tiny-vocab counter exists for."""
    from marc_solr_profiling_spark.operators.sampling import pack_shards

    tok = tiny_tokenizer()
    rows = [(i, " the thin and of " * (1 + i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counted = with_bpe_token_count(df, tok)
    packed = pack_shards(counted, tokens_per_shard=64,
                         weight_col="bpe_tokens")
    got = {r["doc_id"]: (r["shard_id"], r["bpe_tokens"])
           for r in packed.collect()}
    # serial reference: docs laid end to end in doc_id order
    start = 0
    for i in range(40):
        w = tok.count(rows[i][1])
        assert got[i] == (start // 64, w), i
        start += w


def test_with_bpe_token_count_spark(spark):
    tok = tiny_tokenizer()
    rows = [(1, " the thin and"), (2, ""), (3, None), (4, "of the er")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in with_bpe_token_count(df, tok).collect()}
    assert got == {1: tok.count(" the thin and"), 2: 0, 3: 0,
                   4: tok.count("of the er")}


# ---------------------------------------------------------------------------
# BPE TRAINING (round 4): learn the merges from the corpus
# ---------------------------------------------------------------------------

def _ref_train(word_counts, n_merges):
    """From-scratch Sennrich reference: recompute pair counts from the
    ORIGINAL words after each merge (different code path from the
    incremental in-place trainer)."""
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, c in word_counts.items():
            syms = list(w)
            for a, b in merges:
                i = 0
                while i < len(syms) - 1:
                    if syms[i] == a and syms[i + 1] == b:
                        syms[i:i + 2] = [a + b]
                    else:
                        i += 1
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        merges.append(min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0])
    return merges


def test_train_hand_computed(spark):
    from marc_solr_profiling_spark.functions.bpe import train_bpe_merges

    # the classic Sennrich example shape: 'lo' dominates, then 'low'
    docs = spark.createDataFrame(
        [("low low low low low lower lower newest newest",)], "text string")
    merges = train_bpe_merges(docs, n_merges=3, min_count=1)
    # pieces carry the GPT-2 leading space except the first word:
    # ('low' x1, ' low' x4, ' lower' x2, ' newest' x2)
    # round 1: ('l','o') count 7 wins (('o','w') also 7; lex tie-break)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")   # 'low' now one symbol path
    assert merges[2] == (" ", "low")


def test_train_matches_reference_loop(spark):
    import random

    from marc_solr_profiling_spark.functions.bpe import (
        train_bpe_merges, word_freq_table,
    )

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "beer", "bear", "bean"]
    text = " ".join(rng.choice(vocab) for _ in range(400))
    docs = spark.createDataFrame([(text,)], "text string")

    got = train_bpe_merges(docs, n_merges=12, min_count=1)
    wc = {r["w"]: r["c"]
          for r in word_freq_table(docs).collect() if len(r["w"]) >= 2}
    want = _ref_train(wc, 12)
    assert got == want


def test_trained_tokenizer_roundtrip(spark):
    from marc_solr_profiling_spark.functions.bpe import (
        tokenizer_from_corpus, with_bpe_token_count,
    )

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox"),
         (2, "dog dog dog the the the")],
        "doc_id long, text string")
    tok = tokenizer_from_corpus(docs, n_merges=20, min_count=1)
    # learned merges compress: fewer tokens than characters, and common
    # words trained into the vocab merge further than rare ones
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in with_bpe_token_count(docs, tok).collect()}
    assert out[1] < len("the quick brown fox")
    assert out[2] <= 6  # ' the'/' dog' families fully merged
    # counts are consistent with direct encode
    assert out[0] == tok.count("the quick brown fox jumps over the lazy dog")


def test_pair_counts_match_duckdb(spark):
    import duckdb

    from marc_solr_profiling_spark.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    got = [(r["pair"], r["cnt"])
           for r in QUERIES["bpe_train_step"](spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.execute(ORACLE_SQL["bpe_train_step"]).fetchall()
    assert got == [tuple(r) for r in want]
