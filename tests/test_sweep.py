"""Sweep-harness unit tests (experiments/sweep.py).

The reference aggregates logs with ``build_csv.py`` (tolerant of bad logs);
our sweep additionally merges with the existing aggregate CSV so pruned
per-config artifacts (they are regenerable and routinely untracked) do not
lose rows on a partial re-run.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "experiments"))


def test_aggregate_merges_with_existing_csv(tmp_path):
    from sweep import aggregate

    (tmp_path / "foo_3_search.log").write_text(
        "junk\n{'filename': 'b/foo.blif', 'mapper': 'search', 'fbs_size': 3,"
        " 'nb_bootstrap': 5, 'norm2_linprod': 2, 'time': 0.1}\n")
    (tmp_path / "broken.log").write_text("not a dict\n")
    csv_path = tmp_path / "agg.csv"
    csv_path.write_text(
        "bench,boot_cost,fbs_size,filename,mapper,nb_bootstrap,"
        "norm2_linprod,time,total_cost\n"
        "bar,1.0,4,b/bar.blif,search,7,3,0.2,7.0\n"
        "foo,2.0,3,b/foo.blif,search,99,9,9.9,198.0\n")

    rows = aggregate(tmp_path, csv_path)
    assert len(rows) == 2
    fresh = next(r for r in rows if r["bench"] == "foo")
    assert fresh["nb_bootstrap"] == 5          # fresh log wins
    old = next(r for r in rows if r["bench"] == "bar")
    assert old["nb_bootstrap"] == 7            # CSV-only row survives
    # derived cost columns are recomputed downstream, never carried over
    assert "boot_cost" not in old and "total_cost" not in old


def test_configs_for_mapper_override(tmp_path):
    from sweep import configs_for

    benches = [tmp_path / "x.blif"]
    cfgs = list(configs_for("generated", benches, tmp_path,
                            mappers=["best"]))
    assert all(c[3] == "best" for c in cfgs)           # no basic baseline
    assert {c[2] for c in cfgs} == set(range(2, 17))
