"""Examples stay runnable: each --smoke mode executes end to end in a
subprocess (the examples double as the reference's de-facto system test
tier, SURVEY §4)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ,
       "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
       + " --xla_force_host_platform_device_count=8",
       "JAX_PLATFORMS": "cpu"}


def run_example(script, *args, timeout=600):
    cmd = [sys.executable, os.path.join(ROOT, "examples", script), *args]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                       env=ENV, cwd=ROOT)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_tts_speak_smoke(tmp_path):
    out = run_example("tts_speak.py", "--smoke",
                      "--out", str(tmp_path / "x.wav"))
    assert '"sample_rate"' in out


def test_whisper_stt_smoke():
    out = run_example("whisper_stt.py", "--smoke", "--max-tokens", "4")
    assert '"text"' in out


def test_serve_clients_smoke():
    out = run_example("serve_clients.py", "--cpu", "--clients", "2",
                      "--tokens", "6", "--chunk", "3")
    assert "aggregate" in out


@pytest.mark.skipif(os.environ.get("WT_FAST_TESTS") == "1",
                    reason="slower smoke (compiles a small UNet)")
def test_sd_image_smoke(tmp_path):
    out = run_example("sd_image.py", "--smoke", "--cpu", "--steps", "2",
                      "--out", str(tmp_path / "x.ppm"), timeout=900)
    assert "wrote" in out


@pytest.mark.skipif(os.environ.get("WT_FAST_TESTS") == "1",
                    reason="slower smoke (tiny llava)")
def test_llava_chat_smoke():
    out = run_example("llava_chat.py", "--smoke", "--max-tokens", "4",
                      timeout=900)
    assert '"response"' in out


def test_multihost_train_smoke():
    out = run_example("multihost_train.py", "--smoke", timeout=600)
    assert "both workers finished" in out


def test_speculative_decode_smoke():
    out = run_example("speculative_decode.py", "--smoke", "--k", "3")
    assert "token-exact" in out and "ok" in out


def test_rwkv_lora_train_smoke():
    out = run_example("rwkv_lora_train.py", "--smoke", timeout=900)
    assert "OK: adapters trained" in out
