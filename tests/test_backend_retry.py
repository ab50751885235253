"""ensure_backend: transient-register recovery (NOTES.md axon quirks).

The axon plugin's registration can transiently fail at interpreter start
and is swallowed by the environment's sitecustomize; jax then raises
"not in the list of known backends" on first use and only a process
re-exec can recover. These tests exercise the decision logic on CPU.
"""

import os

import jax
import pytest

from tpulmi.utils.backend_retry import _ENV, ensure_backend


def test_healthy_backend_no_op(monkeypatch):
    monkeypatch.setenv(_ENV, "2")
    ensure_backend()
    assert _ENV not in os.environ  # counter cleared on success


def _raise_unregistered(*a, **k):
    raise RuntimeError(
        "Unable to initialize backend 'axon': Backend 'axon' is not in the "
        "list of known backends: ['cpu', 'tpu']."
    )


def test_reexecs_below_budget(monkeypatch):
    calls = {}
    monkeypatch.setattr(jax, "devices", _raise_unregistered)
    monkeypatch.setattr("time.sleep", lambda s: calls.setdefault("slept", s))
    monkeypatch.setattr(
        "os.execv", lambda exe, argv: calls.setdefault("execv", (exe, argv)))
    monkeypatch.delenv(_ENV, raising=False)
    ensure_backend(max_retries=3, sleep_s=0.5)
    exe, argv = calls["execv"]
    assert argv[0] == exe  # re-exec of the same interpreter + argv
    assert calls["slept"] == 0.5
    assert os.environ[_ENV] == "1"  # counter advanced for the next process


def test_raises_at_budget(monkeypatch):
    monkeypatch.setattr(jax, "devices", _raise_unregistered)
    monkeypatch.setenv(_ENV, "3")
    with pytest.raises(RuntimeError, match="known backends"):
        ensure_backend(max_retries=3)


def test_other_runtime_errors_propagate(monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("device claim wedged")

    monkeypatch.setattr(jax, "devices", boom)
    with pytest.raises(RuntimeError, match="wedged"):
        ensure_backend()
