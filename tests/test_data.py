"""Data layer tests: WAV IO, protocol parsing, duration fitting, loader."""

import os

import numpy as np
import pytest

from rtdsd_tpu.data.dataset import (AudioDataset, adjust_duration,
                                    adjust_duration_random_start)
from rtdsd_tpu.data.io import load_audio, read_wav, write_wav
from rtdsd_tpu.data.loader import Batch, DataLoader
from rtdsd_tpu.data.protocols import (Trial, parse_asvspoof2019_train,
                                      parse_asvspoof2021_df,
                                      parse_asvspoof2021_la,
                                      parse_asvspoof5, parse_in_the_wild)


def test_wav_roundtrip(tmp_path, rng):
    wave = (rng.standard_normal(1600) * 0.3).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, wave, 16000)
    back, sr = load_audio(path)
    assert sr == 16000
    assert back.shape == (1600,)
    np.testing.assert_allclose(back, wave, atol=1.0 / 32768 + 1e-6)


def test_wav_reader_matches_scipy(tmp_path, rng):
    import scipy.io.wavfile as sw

    wave = (rng.standard_normal(800) * 0.3).astype(np.float32)
    path = str(tmp_path / "b.wav")
    sw.write(path, 16000, (wave * 32767).astype(np.int16))
    ours, sr = read_wav(path)
    ref_sr, ref = sw.read(path)
    assert sr == ref_sr
    np.testing.assert_allclose(ours[0], ref.astype(np.float32) / 32768.0,
                               atol=1e-7)


def test_adjust_duration_tiling_semantics():
    x = np.asarray([1.0, 2.0, 3.0])
    # 3 -> 8: [1,2,3]*2 + [1,2] (whole tiles + residue prefix, then first 8)
    np.testing.assert_array_equal(adjust_duration(x, 8),
                                  [1, 2, 3, 1, 2, 3, 1, 2])
    # longer than duration: first-N
    np.testing.assert_array_equal(adjust_duration(np.arange(10.0), 4),
                                  [0, 1, 2, 3])
    # 2-D squeeze like the reference
    np.testing.assert_array_equal(adjust_duration(x[None, :], 4), [1, 2, 3, 1])


def test_adjust_duration_random_start_bounds(rng):
    x = np.arange(100.0)
    for _ in range(10):
        w = adjust_duration_random_start(x, 40, rng)
        assert w.shape == (40,)
        assert w[0] == w.min() and w[0] <= 60  # contiguous window
        np.testing.assert_array_equal(w, np.arange(w[0], w[0] + 40))


def _write_protocol(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_parse_2019_train(tmp_path):
    proto = str(tmp_path / "train.txt")
    _write_protocol(proto, [
        "LA_0079 LA_T_1138215 - - bonafide",
        "LA_0079 LA_T_1271820 - A01 spoof",
        "LA_0079 LA_T_no_speech_1 - A02 spoof",
    ])
    trials, n_spoof, n_bona = parse_asvspoof2019_train(proto, "/d")
    assert n_spoof == 2 and n_bona == 1
    assert trials[0] == Trial("/d/LA_T_1138215.flac", "LA_T_1138215", 1, "-")
    assert trials[1].label == 0 and trials[1].attack == "A01"
    # exclusion filter
    trials2, _, _ = parse_asvspoof2019_train(proto, "/d",
                                             include_non_speech=False)
    assert len(trials2) == 2 and len(trials) == 3


def test_parse_2021_la_and_df(tmp_path):
    proto = str(tmp_path / "la.txt")
    _write_protocol(proto, [
        "LA_0009 LA_E_9332881 alaw ita_tx bonafide notrim eval",
        "LA_0009 LA_E_6866159 alaw ita_tx A07 notrim eval",
    ])
    trials = parse_asvspoof2021_la(proto, "/d")
    assert trials[0].label == 1 and trials[1].label == 0
    assert trials[0].path == "/d/LA_E_9332881.flac"

    proto = str(tmp_path / "df.txt")
    _write_protocol(proto, [
        "LA_0023 DF_E_2000011 nocodec asvspoof A14 spoof notrim eval",
        "LA_0023 DF_E_2000013 nocodec asvspoof - bonafide notrim eval",
    ])
    trials = parse_asvspoof2021_df(proto, "/d")
    assert trials[0].label == 0 and trials[1].label == 1
    trials = parse_asvspoof2021_df(proto, "/d", spec=True)
    assert trials[0].utt_id == "LA_0023" and trials[0].label == 1


def test_parse_itw_and_asvspoof5(tmp_path):
    proto = str(tmp_path / "itw.txt")
    _write_protocol(proto, ["0.wav bonafide", "1 spoof"])
    trials = parse_in_the_wild(proto, "/w")
    assert trials[0].path == "/w/0.wav" and trials[0].label == 1
    assert trials[1].path == "/w/1.wav" and trials[1].label == 0

    proto = str(tmp_path / "a5.txt")
    _write_protocol(proto, ["flac_T/a.flac train bonafide",
                            "flac_T/b.flac dev spoof"])
    trials = parse_asvspoof5(proto, "/r")
    assert trials[0].path == "/r/flac_T/a.flac" and trials[0].label == 1
    assert parse_asvspoof5(proto, "/r", subset="dev")[0].label == 0


@pytest.fixture
def wav_dataset(tmp_path, rng):
    trials = []
    for i in range(7):
        path = str(tmp_path / f"u{i}.wav")
        write_wav(path, (rng.standard_normal(500 + 100 * i) * 0.2
                         ).astype(np.float32), 16000)
        trials.append(Trial(path, f"u{i}", i % 2))
    return AudioDataset(trials, duration=800)


def test_dataset_get(wav_dataset):
    uid, wave, label = wav_dataset.get(0)
    assert uid == "u0" and wave.shape == (800,) and label == 0
    assert wave.dtype == np.float32


def test_loader_epochs_reshuffle_and_pad(wav_dataset):
    loader = DataLoader(wav_dataset, batch_size=4, shuffle=True,
                        num_workers=1, seed=7)
    loader.set_epoch(0)
    b0 = [b.utt_ids for b in loader]
    loader.set_epoch(1)
    b1 = [b.utt_ids for b in loader]
    assert b0 != b1  # reshuffles per epoch (reference defect #5 fixed)
    assert len(b0) == 2
    # last batch padded to full size with valid count
    last = list(loader)[-1]
    assert last.waves.shape == (4, 800)
    assert last.valid == 3


def test_loader_process_striping(wav_dataset):
    seen = []
    for pi in range(2):
        loader = DataLoader(wav_dataset, batch_size=2, shuffle=False,
                            num_workers=1, process_index=pi, process_count=2)
        for b in loader:
            seen.extend(b.utt_ids[:b.valid])
    # every utterance covered (with wrap-padding duplicates allowed)
    assert set(seen) == {f"u{i}" for i in range(7)}


def test_loader_threaded_matches_sync(wav_dataset):
    a = [b.utt_ids for b in DataLoader(wav_dataset, 2, num_workers=1)]
    b = [b.utt_ids for b in DataLoader(wav_dataset, 2, num_workers=3)]
    assert a == b


# ------------------------------------------------ host corpus augmentation

def _noise_dir(tmp_path, rng, n=3, length=1200):
    d = tmp_path / "noises"
    d.mkdir()
    for i in range(n):
        write_wav(str(d / f"n{i}.wav"),
                  (rng.standard_normal(length) * 0.1).astype(np.float32),
                  16000)
    return str(d)


def test_background_noise_snr(tmp_path, rng):
    from rtdsd_tpu.data.host_augment import BackgroundNoiseCorpus

    corpus = BackgroundNoiseCorpus(_noise_dir(tmp_path, rng), p=1.0,
                                   min_snr_db=10.0, max_snr_db=10.0)
    wave = (rng.standard_normal(800) * 0.3).astype(np.float32)
    out = corpus(wave, np.random.default_rng(0))
    added = out - wave
    assert added.any()  # noise was mixed in
    snr_db = 20 * np.log10(np.sqrt(np.mean(wave ** 2))
                           / np.sqrt(np.mean(added ** 2)))
    assert abs(snr_db - 10.0) < 0.1  # exact SNR scaling


def test_background_noise_probability_gate(tmp_path, rng):
    from rtdsd_tpu.data.host_augment import BackgroundNoiseCorpus

    corpus = BackgroundNoiseCorpus(_noise_dir(tmp_path, rng), p=0.0)
    wave = rng.standard_normal(800).astype(np.float32)
    out = corpus(wave, np.random.default_rng(0))
    np.testing.assert_array_equal(out, wave)


def test_host_chain_wired_into_dataset(tmp_path, rng):
    from rtdsd_tpu.data.host_augment import (BackgroundNoiseCorpus,
                                             HostAugmentChain)

    trials = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.wav")
        write_wav(p, (rng.standard_normal(900) * 0.2).astype(np.float32),
                  16000)
        trials.append(Trial(p, f"s{i}", 1))
    chain = HostAugmentChain([BackgroundNoiseCorpus(
        _noise_dir(tmp_path, rng), p=1.0)])
    ds_plain = AudioDataset(trials, duration=800)
    ds_aug = AudioDataset(trials, duration=800, host_augment=chain)
    g = np.random.default_rng(3)
    _, plain, _ = ds_plain.get(0, g)
    _, auged, _ = ds_aug.get(0, np.random.default_rng(3))
    assert plain.shape == auged.shape == (800,)
    assert not np.array_equal(plain, auged)
    # eval path (no rng) stays augmentation-free
    _, w, _ = ds_aug.get(0)
    np.testing.assert_array_equal(w, plain)


def test_mp3_compression_gated():
    from rtdsd_tpu.data import host_augment as ha

    if ha.mp3_codec_available():
        pytest.skip("codec present; gating path not exercised")
    with pytest.raises(ImportError):
        ha.Mp3Compression()


def test_background_noise_empty_file_skipped(tmp_path, rng):
    from rtdsd_tpu.data.host_augment import BackgroundNoiseCorpus

    d = tmp_path / "noises"
    d.mkdir()
    write_wav(str(d / "empty.wav"), np.zeros(0, np.float32), 16000)
    corpus = BackgroundNoiseCorpus(str(d), p=1.0)
    wave = rng.standard_normal(400).astype(np.float32)
    out = corpus(wave, np.random.default_rng(0))  # must not crash
    np.testing.assert_array_equal(out, wave)


def _write_extensible_float_wav(path, wave, sr=16000):
    """WAVE_FORMAT_EXTENSIBLE container with IEEE-float SubFormat."""
    import struct

    pcm = np.asarray(wave, np.float32).tobytes()
    guid = struct.pack("<H", 3) + b"\x00\x00" + \
        b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32) + \
        struct.pack("<HHI", 22, 32, 0x4) + guid
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(pcm)) + pcm)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_extensible_float_wav_decodes_correctly(tmp_path, rng):
    wave = (rng.standard_normal(600) * 0.3).astype(np.float32)
    path = str(tmp_path / "ext.wav")
    _write_extensible_float_wav(path, wave)
    got, sr = load_audio(path)
    assert sr == 16000
    np.testing.assert_allclose(np.squeeze(got), wave, rtol=0, atol=0)


def test_extensible_float_wav_native_decoder(tmp_path, rng):
    from rtdsd_tpu.native import flac as native

    if not native.available():
        pytest.skip("native library not built")
    wave = (rng.standard_normal(600) * 0.3).astype(np.float32)
    path = str(tmp_path / "ext.wav")
    _write_extensible_float_wav(path, wave)
    got, sr = native.decode(path)
    assert sr == 16000
    np.testing.assert_allclose(np.squeeze(got), wave, rtol=0, atol=1e-7)


@pytest.fixture
def corrupt_dataset(tmp_path, rng):
    """6 utterances, u2 undecodable (garbage bytes)."""
    trials = []
    for i in range(6):
        path = str(tmp_path / f"c{i}.wav")
        if i == 2:
            with open(path, "wb") as fh:
                fh.write(b"\x00garbage-not-audio\xff" * 10)
        else:
            write_wav(path, (rng.standard_normal(900) * 0.2
                             ).astype(np.float32), 16000)
        trials.append(Trial(path, f"c{i}", i % 2))
    return AudioDataset(trials, duration=800)


@pytest.mark.parametrize("use_native", [False, True])
def test_decode_error_raise_policy(corrupt_dataset, use_native):
    loader = DataLoader(corrupt_dataset, batch_size=3, num_workers=1,
                        use_native=use_native, on_decode_error="raise")
    if use_native and loader._native is None:
        pytest.skip("native library not built")
    # python path re-raises the decoder's original error; native raises
    # RuntimeError with the failed paths
    with pytest.raises((RuntimeError, ValueError)):
        list(loader)


@pytest.mark.parametrize("use_native", [False, True])
def test_decode_error_skip_policy(corrupt_dataset, use_native):
    """skip: the corrupt row is dropped, warned about, excluded from
    Batch.valid, and never surfaces under a wrong utt_id (both loader
    implementations share these semantics)."""
    import warnings

    loader = DataLoader(corrupt_dataset, batch_size=3, num_workers=1,
                        use_native=use_native, on_decode_error="skip")
    if use_native and loader._native is None:
        pytest.skip("native library not built")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        batches = list(loader)
    assert any("undecodable" in str(w.message) for w in caught)
    assert len(batches) == 2
    # batch 0 holds c0..c2 with c2 dropped: 2 valid rows, padded to 3
    b0 = batches[0]
    assert b0.valid == 2
    assert b0.utt_ids[:b0.valid] == ["c0", "c1"]
    assert "c2" not in b0.utt_ids
    assert b0.waves.shape == (3, 800)
    # batch 1 is untouched
    assert batches[1].valid == 3
    assert batches[1].utt_ids[:3] == ["c3", "c4", "c5"]
    # loaders agree that every surviving row decodes to real audio
    assert np.abs(b0.waves[: b0.valid]).sum() > 0


def test_decode_error_bad_value_rejected(wav_dataset):
    with pytest.raises(ValueError, match="on_decode_error"):
        DataLoader(wav_dataset, batch_size=2, on_decode_error="ignore")
