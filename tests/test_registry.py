

def test_coverage_doc_cites_every_query():
    """COVERAGE.md's inventory must stay line-by-line checkable: every
    registered query name appears verbatim (backtick-quoted) somewhere."""
    import pathlib

    from spark_streaming_twitter_spark.registry import load_all

    cov = (
        pathlib.Path(__file__).resolve().parents[1] / "COVERAGE.md"
    ).read_text()
    missing = [n for n in load_all() if f"`{n}`" not in cov]
    assert not missing, f"uncited in COVERAGE.md: {missing}"


def test_coverage_doc_headline_count_matches_registry():
    """The prose query count in COVERAGE.md drifted twice (r6: 206, r7: 226);
    pin it to the registry via an explicit QUERY_COUNT marker so adding a
    query without bumping the header fails loudly (VERDICT r7 ask #2)."""
    import pathlib
    import re

    from spark_streaming_twitter_spark.registry import load_all

    cov = (
        pathlib.Path(__file__).resolve().parents[1] / "COVERAGE.md"
    ).read_text()
    m = re.search(r"<!--QUERY_COUNT-->(\d+)<!--/QUERY_COUNT-->", cov)
    assert m, "COVERAGE.md is missing the QUERY_COUNT marker"
    assert int(m.group(1)) == len(load_all()), (
        f"COVERAGE.md says {m.group(1)} queries but the registry has "
        f"{len(load_all())} — update the header marker"
    )


def test_gate_order_fronts_driver_unproven_queries():
    """The gate queue must self-rotate (VERDICT r8 ask #1, refined r9 #1):
    a query named green in any committed CORRECTNESS_r*.json sorts after
    every query that is not, so the driver's ~50-slot gate always reaches
    new debt without a manual rotation commit. Within the proven bucket,
    OLDEST evidence sorts first (staleness re-verification rotation) — so
    the test has a non-vacuous assertion even in the zero-debt goal state
    round 9 reached, instead of hard-failing on `assert unproven`."""
    from spark_streaming_twitter_spark.registry import (
        _RECHECK_FIRST,
        _driver_green_rounds,
        load_all,
    )

    rounds = _driver_green_rounds()
    assert rounds, "no committed CORRECTNESS_r*.json rows parsed"
    order = list(load_all())
    # semantics-changed names re-enter the unproven tier regardless of
    # their (now-stale) green rows — the gate must re-prove them
    unproven = [
        n for n in order if n not in rounds or n in set(_RECHECK_FIRST)
    ]
    proven = [n for n in order if n in rounds and n not in set(_RECHECK_FIRST)]
    if unproven:
        last_unproven = max(order.index(n) for n in unproven)
        first_proven = min(order.index(n) for n in proven)
        assert last_unproven < first_proven, (
            f"proven query {order[first_proven]!r} sorts before unproven "
            f"{order[last_unproven]!r}"
        )
    # freshness rotation: proven queries are non-decreasing in their
    # newest-green round, so the stalest evidence is re-verified first
    proven_rounds = [rounds[n] for n in proven]
    assert proven_rounds == sorted(proven_rounds), (
        "proven bucket is not ordered oldest-evidence-first"
    )


def test_gate_order_rotates_stalest_evidence_first(tmp_path, monkeypatch):
    """Synthetic zero-debt state: every query green somewhere, the gate
    fronts the one whose newest green row is oldest."""
    import json

    import spark_streaming_twitter_spark.registry as reg

    root = tmp_path / "repo"
    pkg = root / "pkg"
    pkg.mkdir(parents=True)
    green_row = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    (root / "CORRECTNESS_r01.json").write_text(
        json.dumps({"old_a": green_row, "old_b": green_row})
    )
    (root / "CORRECTNESS_r03.json").write_text(
        json.dumps({"old_b": green_row, "fresh": green_row})
    )
    monkeypatch.setattr(reg, "__file__", str(pkg / "registry.py"))
    rounds = reg._driver_green_rounds()
    assert rounds == {"old_a": 1, "old_b": 3, "fresh": 3}
    order = reg.gate_order({"old_a", "old_b", "fresh"})
    assert order[0] == "old_a", f"stalest row not fronted: {order}"


def test_gate_order_ignores_failing_driver_rows(tmp_path, monkeypatch):
    """A failing driver row must NOT count as proven — the query stays at
    the front of the queue for a retry."""
    import json

    import spark_streaming_twitter_spark.registry as reg

    root = tmp_path / "repo"
    pkg = root / "pkg"
    pkg.mkdir(parents=True)
    (root / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "good": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": None,
                },
                "bad_hash": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": False,
                    "err": None,
                },
                "bad_err": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": "boom",
                },
            }
        )
    )
    monkeypatch.setattr(reg, "__file__", str(pkg / "registry.py"))
    green = reg._driver_green_names()
    assert green == frozenset({"good"})


def test_bpe_sentinel_replace_is_greedy_leftmost_merge():
    """The wrap-each-symbol sentinel encoding's core claim (text/corpus.py):
    plain string replace of '_a__b_' with '_ab_' implements EXACTLY the
    greedy-leftmost non-overlapping pair merge BPE specifies, for any
    symbol sequence — including the adjacent-run case ('aaaa' -> 'aa','aa')
    and multi-char symbols from earlier merges. Property-tested against a
    reference Python merge."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    SYMS = ["a", "b", "ab", "ba", "aa", "bb", "aab"]

    def ref_merge(symbols, a, b):
        out, i = [], 0
        while i < len(symbols):
            if (
                i + 1 < len(symbols)
                and symbols[i] == a
                and symbols[i + 1] == b
            ):
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        return out

    @settings(max_examples=300, deadline=None)
    @given(
        syms=st.lists(st.sampled_from(SYMS), min_size=0, max_size=10),
        a=st.sampled_from(SYMS),
        b=st.sampled_from(SYMS),
    )
    def check(syms, a, b):
        rep = "".join(f"_{s}_" for s in syms)
        merged_rep = rep.replace(f"_{a}__{b}_", f"_{a}{b}_")
        got = re.findall(r"_([^_]+)_", merged_rep)
        assert got == ref_merge(syms, a, b), (syms, a, b, got)

    check()
