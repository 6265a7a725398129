"""bench.py output contract: exactly ONE JSON line on every exit path.

Round-4 verdict (Weak #3): when the axon backend was unavailable, bench.py
dumped a raw traceback and exited 1 with no parseable line. These tests pin
the fixed contract by injecting failing/succeeding attempt functions into
``bench.run_with_retries`` (the forced-failure "monkeypatched backend")."""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def _stdout_lines(capsys):
    return [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.strip()]


def test_forced_backend_failure_emits_one_error_json_line(capsys):
    err = "Unable to initialize backend 'axon': UNAVAILABLE"
    calls = []
    rc = bench.run_with_retries(
        attempt_fn=lambda: (False, err),
        delays=(0.0, 1.0, 2.0),
        sleep=calls.append,
    )
    assert rc == 1
    lines = _stdout_lines(capsys)
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines}"
    obj = json.loads(lines[0])
    assert obj["metric"] == bench.METRIC
    assert obj["value"] is None
    assert obj["vs_baseline"] is None
    assert err in obj["error"]
    # bounded retries actually waited the configured backoffs
    assert calls == [1.0, 2.0]


def test_attempt_machinery_exception_still_yields_one_json_line(capsys):
    def boom():
        raise OSError("subprocess spawn failed")

    rc = bench.run_with_retries(attempt_fn=boom, delays=(0.0,), sleep=lambda s: None)
    assert rc == 1
    lines = _stdout_lines(capsys)
    assert len(lines) == 1
    obj = json.loads(lines[0])
    assert "OSError" in obj["error"]


def test_success_passthrough_is_one_json_line(capsys):
    payload = json.dumps(
        {"metric": bench.METRIC, "value": 321.0, "unit": bench.UNIT,
         "vs_baseline": 5.297}
    )
    rc = bench.run_with_retries(
        attempt_fn=lambda: (True, payload), delays=(0.0,), sleep=lambda s: None
    )
    assert rc == 0
    lines = _stdout_lines(capsys)
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 321.0


def test_retry_recovers_after_transient_failure(capsys):
    attempts = iter(
        [(False, "UNAVAILABLE"),
         (True, json.dumps({"metric": bench.METRIC, "value": 300.0,
                            "unit": bench.UNIT, "vs_baseline": 4.95}))]
    )
    rc = bench.run_with_retries(
        attempt_fn=lambda: next(attempts), delays=(0.0, 0.0, 0.0),
        sleep=lambda s: None,
    )
    assert rc == 0
    lines = _stdout_lines(capsys)
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 300.0
