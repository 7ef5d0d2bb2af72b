"""The examples/ directory: 1:1 translations of the reference's
example scripts (py-denormalized/python/examples/*.py,
examples/examples/csv_streaming.rs). Kafka forms need a broker; every
script has a broker-free ``--demo``/self-contained mode, hand-run in
CI-like verification. Here: all must at least compile, and the batch
one runs end-to-end as a subprocess."""

import os
import pathlib
import py_compile
import pytest
import subprocess
import sys

EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "examples"


def test_all_examples_compile():
    scripts = sorted(EXAMPLES.glob("*.py"))
    assert len(scripts) >= 5
    for s in scripts:
        py_compile.compile(str(s), doraise=True)


def test_csv_streaming_example_runs():
    env = dict(os.environ, PYTHONPATH=str(EXAMPLES.parent))
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / "csv_streaming.py")],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Data written to csv" in out.stdout


@pytest.mark.slow  # integration tier: subprocess boots its own JVM; csv_streaming stays as the fast end-to-end example
def test_streaming_llm_gate_example_runs():
    env = dict(os.environ, PYTHONPATH=str(EXAMPLES.parent))
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / "streaming_llm_gate.py"), "--demo"],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "trained gate weights" in out.stdout
    assert "near-dup gate passed" in out.stdout
    assert "dynamic-gap sessionization emitted" in out.stdout


@pytest.mark.slow  # integration tier: subprocess boots its own JVM; csv_streaming stays as the fast end-to-end example
def test_llm_corpus_curation_example_runs():
    env = dict(os.environ, PYTHONPATH=str(EXAMPLES.parent))
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / "llm_corpus_curation.py")],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "curated corpus written to" in out.stdout
    assert "learned BPE merges" in out.stdout
    assert "data card" in out.stdout


@pytest.mark.slow  # integration tier: subprocess boots its own JVM; csv_streaming stays as the fast end-to-end example
def test_incremental_dedup_load_example_runs():
    env = dict(os.environ, PYTHONPATH=str(EXAMPLES.parent))
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / "incremental_dedup_load.py")],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "day 0:" in out.stdout and "day 2:" in out.stdout
    assert "final index buckets:" in out.stdout
    # day 0 starts from an empty index: nothing can be a history dup
    assert "day 0: arrived=167 dup_of_history=0" in out.stdout


@pytest.mark.slow  # integration tier: subprocess boots its own JVM; csv_streaming stays as the fast end-to-end example
def test_streaming_quality_to_feast_example_runs():
    env = dict(os.environ, PYTHONPATH=str(EXAMPLES.parent))
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / "streaming_quality_to_feast.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # the chained gate -> monitor -> feast graph must actually emit
    assert "feast.push[corpus_quality_hourly]" in out.stdout
    assert "pushed 8 hourly quality rows" in out.stdout


@pytest.mark.slow  # integration tier: subprocess boots its own JVM; csv_streaming stays as the fast end-to-end example
def test_ann_index_serving_example_runs():
    env = dict(os.environ, PYTHONPATH=str(EXAMPLES.parent))
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / "ann_index_serving.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "index built: 500 vectors" in out.stdout
    # every query retrieves itself first (ADC distance to own cells)
    for qi in range(3):
        assert f"query {qi}: top-5 ids [{qi}," in out.stdout
    assert "partition pruning visible in plan: True" in out.stdout


@pytest.mark.slow  # integration tier: subprocess boots its own JVM; csv_streaming stays as the fast end-to-end example
def test_event_analytics_report_example_runs():
    env = dict(os.environ, PYTHONPATH=str(EXAMPLES.parent))
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / "event_analytics_report.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for section in (
        "conversion funnel", "within one 30-min session",
        "cohort retention", "transitions", "anomalies", "report complete",
    ):
        assert section in out.stdout, section


@pytest.mark.slow  # integration tier: subprocess boots its own JVM; csv_streaming stays as the fast end-to-end example
def test_temporal_attribution_example_runs():
    env = dict(os.environ, PYTHONPATH=str(EXAMPLES.parent))
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / "temporal_attribution.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for section in (
        "backward as-of", "forward as-of + 24h window", "nearest as-of",
        "forward fill vs linear interpolation", "Z-order write layout",
        "report complete",
    ):
        assert section in out.stdout, section


@pytest.mark.slow  # integration tier: subprocess boots its own JVM; csv_streaming stays as the fast end-to-end example
def test_metric_monitoring_suite_example_runs():
    env = dict(os.environ, PYTHONPATH=str(EXAMPLES.parent))
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / "metric_monitoring_suite.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Mann-Kendall trend verdicts" in out.stdout
    assert "breach day(s)" in out.stdout
    assert "S(t)=" in out.stdout
    assert "CUPED diff" in out.stdout
    assert "monitoring suite complete" in out.stdout
