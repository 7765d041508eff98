"""Solr mm-spec grammar (functions/mm_spec.py) vs the documented behavior
of SolrPluginUtils.calculateMinShouldMatch (Solr ref guide, "mm
(Minimum Should Match) Parameter") — including the reference handler's
literal default ``6<-1 6<90%`` (profiling/solr/conf/solrconfig.xml:72).
"""

import pytest

from marc_solr_profiling_spark.functions.mm_spec import parse_mm_spec


@pytest.mark.parametrize(
    "spec,n,expected",
    [
        # bare integers
        ("3", 5, 3),
        ("3", 2, 2),            # clamp to n
        ("0", 4, 0),
        ("-2", 5, 3),           # at most 2 missing
        ("-9", 5, 0),           # clamp to 0
        # percentages (truncate toward zero, like Java (int) cast)
        ("75%", 4, 3),
        ("75%", 10, 7),         # int(7.5) = 7
        ("25%", 9, 2),          # int(2.25) = 2
        ("100%", 6, 6),
        ("-25%", 4, 3),         # 4 + int(-1.0)
        ("-25%", 9, 7),         # 9 + int(-2.25) = 9 - 2
        # single conditional
        ("3<90%", 2, 2),        # n <= 3: all required
        ("3<90%", 3, 3),
        ("3<90%", 10, 9),
        ("2<-1", 5, 4),
        # the reference's literal default
        ("6<-1 6<90%", 1, 1),
        ("6<-1 6<90%", 4, 4),   # n <= 6: all
        ("6<-1 6<90%", 6, 6),
        ("6<-1 6<90%", 7, 6),   # int(6.3) = 6 (later clause wins)
        ("6<-1 6<90%", 10, 9),
        # multi-clause, left-to-right, early return on n <= bound
        ("2<-25% 9<-3", 1, 1),
        ("2<-25% 9<-3", 2, 2),
        ("2<-25% 9<-3", 5, 4),  # 5 + int(-1.25) = 4; second clause 5<=9 -> return
        ("2<-25% 9<-3", 10, 7),
        # whitespace around '<' is tolerated (Solr normalizes it)
        ("6 < -1  6 < 90%", 7, 6),
        # int passthrough (call sites take int | str uniformly)
        (3, 5, 3),
        (9, 4, 4),
        (-1, 4, 0),
    ],
)
def test_parse_mm_spec(spec, n, expected):
    assert parse_mm_spec(spec, n) == expected


def test_malformed_clause_raises():
    with pytest.raises(ValueError):
        parse_mm_spec("<90%", 5)
    with pytest.raises(ValueError):
        parse_mm_spec("6<", 5)
    with pytest.raises(ValueError):
        parse_mm_spec("", 5)
