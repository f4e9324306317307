"""Property-based tests (hypothesis): distributed operators vs naive
single-machine Python models on randomized small inputs — the rigor
layer the reference lacks entirely (SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_graphdb_spark.graph.builder import merge_upsert
from project_graphdb_spark.operators.asof import asof_join
from project_graphdb_spark.streaming.ops import (
    SESSION_GAP_SECONDS,
    sessionize,
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(s: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=int(s))


SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@SETTINGS
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1,
        max_size=15,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_asof_join_matches_python_model(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, u, _ts(t)) for i, (u, t) in enumerate(left)],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(u, _ts(t), float(t)) for u, t in right],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["matched_value"]
        for r in asof_join(ldf, rdf).collect()
    }
    for i, (u, t) in enumerate(left):
        prior = [rt for ru, rt in right if ru == u and rt <= t]
        want = float(max(prior)) if prior else None
        assert got[i] == want, (i, u, t)


@SETTINGS
@given(
    existing=st.dictionaries(
        st.integers(0, 8), st.integers(-5, 5), max_size=8
    ),
    updates=st.dictionaries(
        st.integers(0, 8), st.integers(-5, 5), max_size=8
    ),
)
def test_merge_upsert_matches_dict_semantics(spark, existing, updates):
    if not existing and not updates:
        return
    edf = spark.createDataFrame(
        [(k, v) for k, v in existing.items()] or [(None, None)],
        "k long, v long",
    ).filter("k is not null")
    udf = spark.createDataFrame(
        [(k, v) for k, v in updates.items()] or [(None, None)],
        "k long, v long",
    ).filter("k is not null")
    got = {r["k"]: r["v"] for r in merge_upsert(edf, udf, "k").collect()}
    want = dict(existing)
    want.update(updates)
    assert got == want


@SETTINGS
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20000)),
        min_size=1,
        max_size=20,
    ),
)
def test_sessionize_matches_python_model(spark, events):
    df = spark.createDataFrame(
        [(i, u, _ts(t)) for i, (u, t) in enumerate(events)],
        "event_id long, user_id long, ts timestamp",
    )
    got = sorted(
        (r["user_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in sessionize(df).collect()
    )
    # python model: sort per user by (ts, event_id), split on gaps
    sessions = []
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, t) in enumerate(events):
        by_user.setdefault(u, []).append((t, i))
    for u, rows in by_user.items():
        rows.sort()
        cur: list[int] = []
        last = None
        for t, _ in rows:
            if last is not None and t - last > SESSION_GAP_SECONDS:
                sessions.append((u, len(cur), _ts(cur[0]), _ts(cur[-1])))
                cur = []
            cur.append(t)
            last = t
        sessions.append((u, len(cur), _ts(cur[0]), _ts(cur[-1])))
    assert got == sorted(sessions)


@settings(max_examples=200, deadline=None)
@given(text=st.text(max_size=80))
def test_parser_total_on_garbage(text):
    """The parser must be total: any input either parses or raises
    CypherSyntaxError — never an unhandled exception."""
    from project_graphdb_spark.cypher.parser import (
        CypherSyntaxError,
        parse,
    )

    try:
        parse(text)
    except CypherSyntaxError:
        pass


@SETTINGS
@given(
    corpora=st.lists(
        st.lists(
            st.sampled_from("abcde"), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_dup_span_scrub_matches_python_model(spark, corpora):
    """dup_span_scrub vs a naive Python model: span extraction,
    cross-doc duplicate detection, coverage-interval removal."""
    from project_graphdb_spark.operators.corpus import dup_span_scrub

    n = 3
    docs = [(i, t) for i, t in enumerate(corpora)]

    # naive model
    spans: dict[int, list[str]] = {}
    for i, t in docs:
        # mirror tokens(): split(trim(text), '\s+') — empty => ['']
        toks = t.strip().split(" ") if t.strip() else [""]
        spans[i] = [
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        ]
    owners: dict[str, set[int]] = {}
    for i, gs in spans.items():
        for g in gs:
            owners.setdefault(g, set()).add(i)
    dup = {g for g, o in owners.items() if len(o) >= 2}
    expected = {}
    for i, t in docs:
        toks = t.strip().split(" ") if t.strip() else [""]
        starts = [j for j, g in enumerate(spans[i]) if g in dup]
        kept = [
            tok
            for j, tok in enumerate(toks)
            if not any(s <= j <= s + n - 1 for s in starts)
        ]
        expected[i] = (" ".join(kept), len(toks) - len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in dup_span_scrub(df, n=n).collect()
    }
    assert got == expected


@SETTINGS
@given(
    corpora=st.lists(
        st.lists(
            st.sampled_from("abc"), min_size=0, max_size=10
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_winnow_sels_match_python_model(spark, corpora):
    """_winnow_sels vs a naive model: md5 gram hashes, window minima,
    value-level dedup, short/empty-doc edges."""
    import hashlib

    from project_graphdb_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        _winnow_sels,
    )

    docs = [(i, t) for i, t in enumerate(corpora)]
    expected: dict[int, set] = {}
    for i, t in docs:
        toks = t.strip().split(" ") if t.strip() else [""]
        if len(toks) < WINNOW_K:
            continue
        gh = [
            hashlib.md5(
                " ".join(toks[j : j + WINNOW_K]).encode()
            ).hexdigest()[:8]
            for j in range(len(toks) - WINNOW_K + 1)
        ]
        sels = {
            min(gh[s : s + WINNOW_W])
            for s in range(max(len(gh) - WINNOW_W, 0) + 1)
        }
        expected[i] = sels

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in _winnow_sels(df).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    assert got == expected


@SETTINGS
@given(
    st.lists(
        st.tuples(st.sampled_from("abcdefgh"), st.sampled_from("abcdefgh")),
        min_size=1,
        max_size=24,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_kcore_matches_python_peeling(spark, edge_list, k):
    """Delta-based k_core vs a naive Python peeler on random graphs
    including self-loops and reciprocal pairs (the cases the canonical
    least/greatest dedup must get right: a reciprocal pair is ONE
    undirected edge; a self-loop counts 1 toward its own degree)."""
    from project_graphdb_spark.graph.algorithms import k_core

    undirected = {tuple(sorted(e)) for e in edge_list}
    adj: dict[str, set] = {}
    for a, b in undirected:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # degree = #distinct neighbors, self-loop counts 1 (u in adj[u])
    alive = set(adj)
    while True:
        doomed = {
            v for v in alive if len(adj[v] & alive) < k
        }
        if not doomed:
            break
        alive -= doomed
    expected = {v: len(adj[v] & alive) for v in alive}

    df = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r.id: r.core_degree for r in k_core(k=k, edges=df).collect()}
    assert got == expected
