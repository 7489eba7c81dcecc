"""The bench harness's output contract — the driver parses exactly one
compact JSON line from stdout, so a bench.py change that breaks the
line (round 2 lost its bench signal to an overlong line) must fail
HERE, not in the round artifact.

Runs bench.main() against a stubbed two-query registry so the test
costs seconds, not a full sf0.1 pass.
"""

from __future__ import annotations

import json


def test_bench_stdout_is_one_compact_parseable_line(
    spark, monkeypatch, tmp_path, capsys
):
    import bench
    from aws_imdb_data_pipeline_spark.plans.registry import QuerySpec

    def q(spark_, sf_dir):
        return spark_.range(10).selectExpr("id", "id * 2 AS v")

    stub = {
        name: QuerySpec(name=name, fn=q, oracle=None, operators=())
        for name in ("pricing_summary", "shipping_priority")
    }
    monkeypatch.setattr(bench, "REGISTRY", stub)
    monkeypatch.setattr(bench, "HEADLINE", list(stub))
    detail = tmp_path / "detail.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(detail))
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    # exactly one stdout line, parseable, with the driver-read keys
    assert len(out) == 1
    line = json.loads(out[0])
    assert line["metric"] == "headline_suite_seconds"
    assert isinstance(line["value"], float)
    assert line["unit"] == "sec"
    assert set(line["queries"]) == set(stub)
    assert line["calib_sec"] > 0
    # the line must stay comfortably inside a bounded tail capture even
    # with every headline query inlined (round-2 failure mode)
    assert len(out[0]) < 4000
    # side file carries the full map + regression key
    d = json.loads(detail.read_text())
    assert set(d["queries"]) == set(stub)
    assert "regressions" in d and d["sf"] == 0.001
