"""Argparse wiring smoke tests: every subcommand parses its minimal args."""

import pytest

from avsi.cli import parse_args

CASES = {
    "dataset_generator": ["-ca", "/d", "-bs", "1", "2", "-d", "/o", "-num", "0"],
    "audio_preprocessing": ["-a", "/d", "-p", "target", "-o", "/o/pfx"],
    "video_preprocessing": ["-data", "/d", "-s", "1", "-v", "video", "-d", "lm",
                            "-sp", "/pred.dat"],
    "tfrecords_generator": ["-a", "/d", "-d", "/o", "-df", "/dict.txt"],
    "tfrecords_grouping": ["-i", "/a", "-o", "/b"],
    "masking": ["-d", "/tfr", "-ad", "/audio"],
    "training": ["--config", "/c.config"],
    "training_asr": ["--config", "/c.config"],
    "inference_model_generation": ["--config", "/c", "--input_model", "/i",
                                   "--output_model", "/o"],
    "inference": ["-d", "/tfr", "-ad", "/audio", "-ef", "x", "-m", "/ckpt"],
    "inference_asr": ["-d", "/tfr", "-ad", "/audio", "-ef", "x", "-m", "/ckpt",
                      "-df", "/dict.txt"],
    "inference_siasr": ["-d", "/tfr", "-ad", "/audio", "-ef", "x", "-ms", "/si",
                        "-mr", "/asr", "-df", "/dict.txt"],
    "evaluation": ["-ed", "/audio", "-ef", "x", "-o", "out"],
    "serve": ["-m", "/ckpt"],
    "fixture": ["-d", "/o"],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_subcommand_parses(name):
    args = parse_args([name] + CASES[name])
    assert args.subparser_name == name


@pytest.mark.parametrize(
    "name", ["inference", "inference_asr", "inference_siasr", "serve"]
)
def test_lstm_impl_flag(name):
    args = parse_args([name] + CASES[name])
    assert args.lstm_impl == "auto"
    args = parse_args([name] + CASES[name] + ["--lstm_impl", "pallas"])
    assert args.lstm_impl == "pallas"
    with pytest.raises(SystemExit):
        parse_args([name] + CASES[name] + ["--lstm_impl", "cudnn"])


@pytest.mark.parametrize("name", sorted(CASES))
def test_missing_required_args_exit(name):
    required = {
        "training": [], "training_asr": [], "tfrecords_grouping": ["-i", "/a"],
    }
    if name in ("fixture",):
        pytest.skip("all args optional except dest")
    with pytest.raises(SystemExit):
        parse_args([name] + required.get(name, []))


@pytest.mark.parametrize("name", ["inference", "inference_siasr", "serve"])
def test_gap_atten_flags(name):
    """--gap_atten rides every surface that can apply the postfilter —
    incl. `serve` since r5 (service-wide default for /enhance + streams)."""
    from avsi.cli import _gap_atten_opts

    args = parse_args([name] + CASES[name])
    assert _gap_atten_opts(args) is None  # 1.0 = off by default
    args = parse_args(
        [name] + CASES[name]
        + ["--gap_atten", "0.5", "--gap_atten_trust", "20"]
    )
    assert _gap_atten_opts(args) == {"alpha": 0.5, "trust": 20, "ramp": 16}
