"""Prefix-doubling suffix array (operators/suffix.py): hand-checked
ranks on a known string, cross-document ties, and the repeated-passage
property the structure exists for."""

from __future__ import annotations

import pytest

from meerpipe_spark.operators.suffix import suffix_array_ranks


def _ranks(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = suffix_array_ranks(df).collect()
    return {(r.doc_id, r.pos): r.suffix_rank for r in got}


def test_banana_word_suffixes(spark):
    # suffixes of "b a n a n a":
    #   pos 5 'a' < pos 3 'a n a' < pos 1 'a n a n a'
    # < pos 0 'b a n a n a' < pos 4 'n a' < pos 2 'n a n a'
    r = _ranks(spark, [(1, "b a n a n a")])
    order = sorted(r, key=lambda k: r[k])
    assert [p for _, p in order] == [5, 3, 1, 0, 4, 2]
    assert sorted(r.values()) == list(range(6))


def test_cross_document_ties_share_rank(spark):
    # identical suffixes in different docs are the SAME dense rank
    r = _ranks(spark, [(1, "x y z"), (2, "w y z")])
    assert r[(1, 1)] == r[(2, 1)]  # 'y z' == 'y z'
    assert r[(1, 2)] == r[(2, 2)]  # 'z' == 'z'
    assert r[(1, 0)] != r[(2, 0)]
    # dense: max rank + 1 == number of DISTINCT suffixes (4: 'w y z',
    # 'x y z', 'y z', 'z')
    assert max(r.values()) + 1 == 4


def test_matches_direct_sort(spark):
    """Property: prefix-doubling ranks equal dense ranks of a direct
    python sort of the suffix word-lists."""
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a cat sat on a hat the cat sat"),
    ]
    r = _ranks(spark, rows)
    sufs = {}
    for doc_id, text in rows:
        ws = text.split(" ")
        for pos in range(len(ws)):
            sufs[(doc_id, pos)] = tuple(ws[pos:])
    distinct = sorted(set(sufs.values()))
    want = {k: distinct.index(v) for k, v in sufs.items()}
    assert r == want


def test_repeated_passage_detectable(spark):
    """The point of the structure: equal-rank suffixes ARE repeated
    passages (full-suffix repeats); near ranks share prefixes."""
    r = _ranks(spark, [(1, "alpha beta gamma"), (2, "zzz alpha beta gamma")])
    # 'alpha beta gamma' occurs as a full suffix in both docs
    assert r[(1, 0)] == r[(2, 1)]
