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
