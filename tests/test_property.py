"""Property-based replay-vs-oracle equivalence: random stream shapes,
DDL interleavings, orderings, chunkings and partition counts all
reproduce the single-process oracle's final table exactly.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deltaray import ReplayConfig, TableConfig, replay, replay_oracle
from deltaray.gen import write_event_log
from deltaray.oracle import tables_equal
from deltaray.pipeline import read_table

DDL_CHOICES = [
    ("ALTER_TABLE", {"add": ("lang", "string"), "choices": ["en", "de", "fr"]}),
    ("RENAME_COLUMN", {"rename": ("source", "origin")}),
    ("TRUNCATE_TABLE", {}),
]


@st.composite
def replay_cases(draw):
    n_docs = draw(st.integers(20, 120))
    n_events = draw(st.integers(50, 900))
    seed = draw(st.integers(0, 2**31 - 1))
    unordered = draw(st.booleans())
    mix_ins = draw(st.floats(0.1, 0.6))
    mix_del = draw(st.floats(0.05, 0.4))
    mix = (mix_ins, max(0.0, 1.0 - mix_ins - mix_del), mix_del)
    ddl = []
    picked = draw(st.lists(st.sampled_from(range(len(DDL_CHOICES))),
                           unique=True, max_size=2))
    for j, i in zip(picked,
                    sorted(draw(st.lists(st.integers(0, 800), min_size=len(picked),
                                         max_size=len(picked))))):
        op, kw = DDL_CHOICES[j]
        ddl.append((i, "docs", op, dict(kw)))
    chunk = draw(st.integers(100, 2000))
    parts = draw(st.sampled_from([1, 3, 8]))
    hot = draw(st.sampled_from([0.0, 0.5]))
    directives = draw(st.sampled_from([
        [], ["mask tokens 0 3"], ["rename n_tok tok_count"],
        ["retokenize-stub tokens 7"],
    ]))
    return dict(n_docs=n_docs, n_events=n_events, seed=seed,
                unordered=unordered, mix=mix, ddl=ddl, chunk=chunk,
                parts=parts, hot=hot, directives=directives)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(case=replay_cases())
def test_random_replay_equals_oracle(case, tmp_path_factory):
    base = tmp_path_factory.mktemp("prop")
    log, lake = str(base / "log"), str(base / "lake")
    # RENAME_COLUMN of 'source' conflicts with a directive renaming it too;
    # the engine would reject at assess time — keep the case valid:
    if case["directives"] == ["rename n_tok tok_count"] and any(
        op == "RENAME_COLUMN" for _, _, op, _ in case["ddl"]
    ):
        case["ddl"] = [d for d in case["ddl"] if d[2] != "RENAME_COLUMN"]
    write_event_log(
        log, n_docs=case["n_docs"], n_events=case["n_events"],
        seed=case["seed"], unordered=case["unordered"], mix=case["mix"],
        ddl=case["ddl"], hot_key_frac=case["hot"],
        segment_max_events=max(100, case["chunk"] // 2),
    )
    cfg = ReplayConfig(
        event_log=log, lake=lake, num_partitions=case["parts"],
        chunk_max_events=case["chunk"],
        ordering="UN_ORDERED" if case["unordered"] else "ORDERED",
        tables=[TableConfig("docs", transformations=case["directives"])]
        if case["directives"] else [],
    )
    replay(cfg)
    oracle = replay_oracle(cfg)
    got = read_table(lake, "docs")
    key = oracle["docs"].column_names[0]
    ok, msg = tables_equal(got, oracle["docs"], key=key)
    assert ok, f"{msg}; case={case}"
