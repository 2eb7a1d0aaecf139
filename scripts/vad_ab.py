"""A/B the inpainting mask-placement VADs (VERDICT r2 missing #6).

Strategies: random placement, the reference-style energy VAD, and the
spectral-entropy VAD (ops.waveform.spectral_entropy_vad_segments) — each
placing the standard 128 ms inpainting gap on the 12-clip evidence corpus
(/root/reference/FullSubNet_plus/out_dir/enhanced_0194, the corpus behind
artifacts/inpainting_e2e).

Referee (independent of both VADs): the in-repo YIN pitch tracker
(eval/pitch.yin_pitch_track) — a mask "lands on speech" to the degree its
frames are YIN-voiced. Also reports mask-region RMS relative to clip RMS:
speech-aware placement should select energetic regions.

    python scripts/vad_ab.py

Writes artifacts/inpainting_e2e/vad_ab.json and prints the table that the
REPORT.md section quotes.
"""
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from generative_audio_tpu.data.audio_io import load_audio  # noqa: E402
from generative_audio_tpu.eval.pitch import yin_pitch_track  # noqa: E402
from generative_audio_tpu.ops.waveform import (  # noqa: E402
    energy_vad_segments, normalize_to_dbfs, spectral_entropy_vad_segments)

REF_WAVS = Path("/root/reference/FullSubNet_plus/out_dir/enhanced_0194")
OUT = REPO / "artifacts" / "inpainting_e2e"
SR = 16000
MISSING = int(0.128 * SR)
N_PLACEMENTS = 24          # placements per clip per strategy

YIN_FRAME, YIN_HOP = 1024, 256


def placements(strategy: str, audio: np.ndarray, rng) -> list:
    """Return N_PLACEMENTS (start, end) gaps for one clip, mirroring
    AudioInpaintingDataset._create_mask segment-uniform placement."""
    if strategy == "random":
        segs = []
    elif strategy == "energy":
        segs = energy_vad_segments(audio, SR, min_duration_ms=128)
    else:
        segs = spectral_entropy_vad_segments(audio, SR, min_duration_ms=128)
    segs = [s for s in segs if s[1] - s[0] > MISSING]
    out = []
    for _ in range(N_PLACEMENTS):
        if not segs:
            start = int(rng.integers(0, len(audio) - MISSING + 1))
        else:
            lo, hi = segs[int(rng.integers(0, len(segs)))]
            start = lo + int(rng.integers(0, (hi - lo) - MISSING + 1))
        out.append((start, start + MISSING))
    return out


def main():
    wavs = sorted(REF_WAVS.glob("*.wav"))
    assert wavs, f"evidence corpus missing under {REF_WAVS}"
    stats = {s: {"voiced_frac": [], "rms_rel_db": [], "fallbacks": 0}
             for s in ("random", "energy", "entropy")}

    for wi, wav in enumerate(wavs):
        audio = normalize_to_dbfs(load_audio(wav, SR), -25.0)
        f0, voiced, _ = yin_pitch_track(audio, SR, frame_length=YIN_FRAME,
                                        hop_length=YIN_HOP)
        clip_rms_db = 20 * np.log10(np.sqrt(np.mean(audio ** 2)) + 1e-12)
        for strategy in stats:
            rng = np.random.default_rng(1000 + wi)   # same seeds across arms
            for start, end in placements(strategy, audio, rng):
                # YIN frames whose window lies fully inside the gap
                first = int(np.ceil(start / YIN_HOP))
                last = (end - YIN_FRAME) // YIN_HOP
                if last < first:   # gap shorter than a YIN frame: nearest
                    first = last = int(round(
                        (start + end - YIN_FRAME) / 2 / YIN_HOP))
                frames = voiced[max(0, first):max(0, last) + 1]
                stats[strategy]["voiced_frac"].append(
                    float(np.mean(frames)) if len(frames) else 0.0)
                seg_rms_db = 20 * np.log10(
                    np.sqrt(np.mean(audio[start:end] ** 2)) + 1e-12)
                stats[strategy]["rms_rel_db"].append(
                    float(seg_rms_db - clip_rms_db))

    table = {}
    for strategy, d in stats.items():
        vf, rr = np.asarray(d["voiced_frac"]), np.asarray(d["rms_rel_db"])
        table[strategy] = {
            "n_placements": int(len(vf)),
            "voiced_frac_mean": round(float(vf.mean()), 4),
            "voiced_frac_p50": round(float(np.median(vf)), 4),
            "frac_fully_voiced": round(float(np.mean(vf >= 0.999)), 4),
            "frac_unvoiced": round(float(np.mean(vf <= 0.001)), 4),
            "rms_rel_db_mean": round(float(rr.mean()), 2),
            "rms_rel_db_p10": round(float(np.percentile(rr, 10)), 2),
        }

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "vad_ab.json").write_text(json.dumps({
        "corpus": str(REF_WAVS), "n_clips": len(wavs),
        "placements_per_clip": N_PLACEMENTS,
        "referee": "eval/pitch.yin_pitch_track voiced flags "
                   f"(frame {YIN_FRAME}, hop {YIN_HOP})",
        "strategies": table}, indent=2))

    hdr = (f"{'strategy':<10} {'voiced mean':>11} {'p50':>6} "
           f"{'fully-voiced':>13} {'unvoiced':>9} {'rms rel dB':>11} "
           f"{'p10 dB':>7}")
    print(hdr)
    for s, r in table.items():
        print(f"{s:<10} {r['voiced_frac_mean']:>11.3f} "
              f"{r['voiced_frac_p50']:>6.3f} {r['frac_fully_voiced']:>13.3f} "
              f"{r['frac_unvoiced']:>9.3f} {r['rms_rel_db_mean']:>11.2f} "
              f"{r['rms_rel_db_p10']:>7.2f}")


if __name__ == "__main__":
    main()
