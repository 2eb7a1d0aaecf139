"""Corpus/misc tools tests (gen_lst, collect_lst, resample_dir, analyse,
noisy speech synthesizer, DNS-MOS client with injected transport).

Reference: FullSubNet_plus/speech_enhance/tools/*.py.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from generative_audio_tpu.cli.tools import (
    gen_lst, collect_lst, resample_dir, read_metric_txt, write_metric_txt,
    compare_metric_files, synthesize_noisy_speech, dns_mos_score, main)
from generative_audio_tpu.data.audio_io import write_wav, read_wav


def _make_wavs(root: Path, n=3, sr=16000, seconds=4.0, amp=0.1, seed=0):
    rng = np.random.default_rng(seed)
    root.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        t = np.arange(int(sr * seconds))
        wav = amp * np.sin(2 * np.pi * 220 * (i + 1) * t / sr) \
            + 0.01 * rng.standard_normal(len(t))
        p = root / f"w{i}.wav"
        write_wav(p, wav.astype(np.float32), sr)
        paths.append(p)
    return paths


def test_gen_lst(tmp_path):
    _make_wavs(tmp_path / "ds" / "sub", n=2)
    _make_wavs(tmp_path / "ds", n=1, seed=1)
    out = tmp_path / "lists" / "all.lst"
    n = gen_lst(tmp_path / "ds", out)
    lines = out.read_text().splitlines()
    assert n == 3 and len(lines) == 3
    assert all(line.endswith(".wav") for line in lines)


def test_collect_lst_filters(tmp_path):
    ds = tmp_path / "ds"
    _make_wavs(ds, n=2, seconds=4.0)
    # too short
    write_wav(ds / "short.wav", 0.1 * np.ones(1600, np.float32), 16000)
    # clipped
    t = np.arange(16000 * 4)
    write_wav(ds / "clipped.wav",
              np.clip(2.0 * np.sin(2 * np.pi * 220 * t / 16000), -1, 1)
              .astype(np.float32), 16000)
    dist = tmp_path / "out" / "speech.lst"
    stats = collect_lst([ds], dist, wav_min_second=3.0,
                        activity_threshold=0.0, total_hrs=1.0,
                        log=lambda *a: None)
    assert stats["too_short"] == 1
    assert stats["clipped"] == 1
    assert stats["selected"] == 2
    assert len(dist.read_text().splitlines()) == 2


def test_resample_dir(tmp_path):
    src = tmp_path / "src"
    _make_wavs(src / "nested", n=2, sr=8000, seconds=1.0)
    n = resample_dir(src, tmp_path / "dst", sr=16000, num_workers=2)
    assert n == 2
    sr, data = read_wav(tmp_path / "dst" / "nested" / "w0.wav")
    assert sr == 16000 and abs(len(data) - 16000) < 10


def test_metric_txt_roundtrip_and_compare(tmp_path):
    f1, f2 = tmp_path / "a.txt", tmp_path / "b.txt"
    write_metric_txt(f1, [("x.wav", 2.0), ("y.wav", 1.0)])
    write_metric_txt(f2, [("x.wav", 1.5), ("y.wav", 1.4)])
    assert read_metric_txt(f1) == {"x.wav": 2.0, "y.wav": 1.0}
    diffs = compare_metric_files(f1, f2)
    assert diffs[0] == ("x.wav", 0.5)
    assert diffs[1][1] == pytest.approx(-0.4)


def test_synthesize_noisy_speech(tmp_path):
    _make_wavs(tmp_path / "clean", n=2, seconds=2.0)
    _make_wavs(tmp_path / "noise", n=2, seconds=1.0, seed=9)
    n = synthesize_noisy_speech(
        tmp_path / "clean", tmp_path / "noise", tmp_path / "out",
        total_hours=6.0 / 3600, audio_length=2.0, log=lambda *a: None)
    assert n == 3
    noisy_files = sorted((tmp_path / "out" / "NoisySpeech_training").iterdir())
    clean_files = sorted((tmp_path / "out" / "CleanSpeech_training").iterdir())
    assert len(noisy_files) == 3 and len(clean_files) == 3
    assert "SNRdb" in noisy_files[0].name
    sr, noisy = read_wav(noisy_files[0])
    assert sr == 16000 and len(noisy) == 32000
    assert np.max(np.abs(noisy)) <= 1.0


def test_dns_mos_client_injected_transport(tmp_path):
    _make_wavs(tmp_path / "test", n=2, seconds=1.0)
    calls = []

    def fake_post(uri, headers, payload):
        calls.append(uri)
        data = json.loads(payload)
        assert len(data["data"]) == 16000
        return {"mos": 3.5}

    rows = dns_mos_score(tmp_path / "test", tmp_path / "scores" / "score.csv",
                         post_fn=fake_post, log=lambda *a: None)
    assert len(rows) == 2 and rows[0]["mos"] == 3.5
    # second run: everything cached, no new requests
    rows2 = dns_mos_score(tmp_path / "test",
                          tmp_path / "scores" / "score.csv",
                          post_fn=fake_post, log=lambda *a: None)
    assert rows2 == [] and len(calls) == 2


def test_cli_dispatcher(tmp_path, capsys):
    _make_wavs(tmp_path / "ds", n=1)
    main(["gen_lst", "--dataset_dir", str(tmp_path / "ds"),
          "--output_lst", str(tmp_path / "o.lst")])
    assert "wrote 1 paths" in capsys.readouterr().out


def test_analyse_subcommand(tmp_path):
    """CLI `tools analyse`: ranked delta txt + two-run histogram
    (analyse.py:58-62 workflow)."""
    f1, f2 = tmp_path / "a.txt", tmp_path / "b.txt"
    write_metric_txt(f1, [("x.wav", 2.0), ("y.wav", 1.0)])
    write_metric_txt(f2, [("x.wav", 1.5), ("y.wav", 1.4)])
    out, png = tmp_path / "delta.txt", tmp_path / "hist.png"
    main(["analyse", "--file1", str(f1), "--file2", str(f2),
          "--output", str(out), "--hist", str(png)])
    ranked = read_metric_txt(out)
    assert ranked["x.wav"] == pytest.approx(0.5)
    assert ranked["y.wav"] == pytest.approx(-0.4)
    assert png.exists() and png.stat().st_size > 0
