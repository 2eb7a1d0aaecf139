"""Transcription plugin factories, tested offline with tiny random-weight
HF models written to disk via save_pretrained (no hub access).
"""
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_whisper_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_whisper")
    cfg = transformers.WhisperConfig(
        vocab_size=64, num_mel_bins=8, d_model=16,
        encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=16, decoder_ffn_dim=16,
        max_source_positions=1500, max_target_positions=48,
        decoder_start_token_id=1, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, begin_suppress_tokens=None, suppress_tokens=None)
    model = transformers.WhisperForConditionalGeneration(cfg)
    model.generation_config.max_length = 8
    model.generation_config.forced_decoder_ids = None
    model.save_pretrained(d)
    fe = transformers.WhisperFeatureExtractor(feature_size=8)
    # minimal tokenizer: whisper needs a vocab; use a bare ByteLevel one
    import json
    vocab = {f"<{i}>": i for i in range(58)}
    # whisper special tokens must resolve to real ids
    for i, special in enumerate(["<|endoftext|>", "<|startoftranscript|>",
                                 "<|notimestamps|>", "<|transcribe|>",
                                 "<|en|>", "<|nospeech|>"]):
        vocab[special] = 58 + i
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = transformers.WhisperTokenizer(str(d / "vocab.json"),
                                        str(d / "merges.txt"))
    processor = transformers.WhisperProcessor(fe, tok)
    processor.save_pretrained(d)
    return d


def test_whisper_factory_offline(tiny_whisper_dir):
    from generative_audio_tpu.eval.transcription import (
        make_whisper_transcribe_fn)
    fn = make_whisper_transcribe_fn(str(tiny_whisper_dir), language=None)
    audio = 0.1 * np.sin(2 * np.pi * 220 *
                         np.arange(8000) / 8000).astype(np.float32)
    text = fn(audio, 8000)  # also exercises the resample-to-16k path
    assert isinstance(text, str)


@pytest.fixture(scope="module")
def tiny_w2v2_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_w2v2")
    cfg = transformers.Wav2Vec2Config(
        vocab_size=12, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=16,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        num_feat_extract_layers=2)
    model = transformers.Wav2Vec2ForCTC(cfg)
    model.save_pretrained(d)
    import json
    vocab = {c: i for i, c in enumerate(
        ["<pad>", "<s>", "</s>", "<unk>", "|", "a", "b", "k", "s", "t",
         "m", "n"])}
    (d / "vocab.json").write_text(json.dumps(vocab))
    tok = transformers.Wav2Vec2CTCTokenizer(str(d / "vocab.json"))
    fe = transformers.Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False)
    transformers.Wav2Vec2Processor(fe, tok).save_pretrained(d)
    return d


def test_phoneme_factory_offline(tiny_w2v2_dir):
    from generative_audio_tpu.eval.transcription import make_phoneme_fn
    fn = make_phoneme_fn(str(tiny_w2v2_dir))
    audio = (0.1 * np.random.default_rng(0).standard_normal(16000)) \
        .astype(np.float32)
    out = fn(audio, 16000)
    assert isinstance(out, str)
