"""Porter stemmer (functions/stemmer.py) — classic fixtures plus
equivalence of the last-character dispatch against a straight scan of
the same suffix tables (the dispatch must be a pure speedup, never a
behavior change).
"""

import random
import string

import pytest

from marc_solr_profiling_spark.functions import stemmer as S


@pytest.mark.parametrize(
    "word,stem",
    [
        ("caresses", "caress"),
        ("ponies", "poni"),
        ("caress", "caress"),
        ("cats", "cat"),
        ("feed", "feed"),
        ("agreed", "agre"),
        ("plastered", "plaster"),
        ("motoring", "motor"),
        ("sing", "sing"),
        ("conflated", "conflat"),
        ("troubled", "troubl"),
        ("sized", "size"),
        ("hopping", "hop"),
        ("falling", "fall"),
        ("hissing", "hiss"),
        ("failing", "fail"),
        ("happy", "happi"),
        ("sky", "sky"),
        ("relational", "relat"),
        ("conditional", "condit"),
        ("rational", "ration"),
        ("valenci", "valenc"),
        ("digitizer", "digit"),
        ("operator", "oper"),
        ("feudalism", "feudal"),
        ("decisiveness", "decis"),
        ("hopefulness", "hope"),
        ("formaliti", "formal"),
        ("triplicate", "triplic"),
        ("formative", "form"),
        ("formalize", "formal"),
        ("electrical", "electr"),
        ("hopeful", "hope"),
        ("goodness", "good"),
        ("revival", "reviv"),
        ("allowance", "allow"),
        ("inference", "infer"),
        ("airliner", "airlin"),
        ("adjustable", "adjust"),
        ("defensible", "defens"),
        ("irritant", "irrit"),
        ("replacement", "replac"),
        ("adjustment", "adjust"),
        ("dependent", "depend"),
        ("adoption", "adopt"),
        ("homologou", "homolog"),
        ("communism", "commun"),
        ("activate", "activ"),
        ("angulariti", "angular"),
        ("homologous", "homolog"),
        ("effective", "effect"),
        ("bowdlerize", "bowdler"),
        ("probate", "probat"),
        ("rate", "rate"),
        ("cease", "ceas"),
        ("controll", "control"),
        ("roll", "roll"),
        # untouched shapes (the last-char fast exit must not change them)
        ("ref0000000x", "ref0000000x"),
        ("0000000", "0000000"),
        ("x", "x"),
        ("zz", "zz"),
    ],
)
def test_porter_fixtures(word, stem):
    assert S.porter_stem(word) == stem


def _scan_step2(w):
    for suffix, repl in S._STEP2:
        out = S._replace_if(w, suffix, repl, 0)
        if out is not None:
            return out
        if w.endswith(suffix):
            return w
    return w


def _scan_step3(w):
    for suffix, repl in S._STEP3:
        out = S._replace_if(w, suffix, repl, 0)
        if out is not None:
            return out
        if w.endswith(suffix):
            return w
    return w


def _scan_step4(w):
    for suffix in S._STEP4:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if suffix == "ion" and (not stem or stem[-1] not in "st"):
                return w
            if S._measure(stem) > 1:
                return stem
            return w
    return w


def test_bucketed_steps_equal_straight_scan():
    rng = random.Random(42)
    words = set()
    sufs = [p[0] for p in S._STEP2] + [p[0] for p in S._STEP3] + list(S._STEP4)
    stems = ["", "a", "xy", "troubl", "controll", "oper", "form", "rel"]
    for suf in sufs:
        for st in stems:
            words.add(st + suf)
    for _ in range(20000):
        words.add("".join(
            rng.choice(string.ascii_lowercase)
            for _ in range(rng.randint(1, 10))
        ))
    for w in words:
        assert S._step2(w) == _scan_step2(w), w
        assert S._step3(w) == _scan_step3(w), w
        assert S._step4(w) == _scan_step4(w), w


def test_fast_exit_charset_is_sound():
    """_ANY_STEP_LAST must contain the last char of EVERY suffix any step
    can match — otherwise the fast exit would skip a real rewrite."""
    lasts = {"s", "d", "g", "y", "e", "l"}  # steps 1a/1b/1c/5a/5b
    for p in S._STEP2:
        lasts.add(p[0][-1])
    for p in S._STEP3:
        lasts.add(p[0][-1])
    for suf in S._STEP4:
        lasts.add(suf[-1])
    assert lasts <= S._ANY_STEP_LAST
