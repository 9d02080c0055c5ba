import os

import pytest

from styletts2_tpu.text import (
    DEFAULT_DICTIONARY_PATH,
    TextCleaner,
    infer_phoneme_dictionary_token_count,
    load_phoneme_dictionary,
    resolve_phoneme_dictionary_settings,
)


def test_default_dictionary_loads():
    table = load_phoneme_dictionary(DEFAULT_DICTIONARY_PATH)
    assert table["$"] == 0
    assert table["A"] == 17
    assert table["a"] == 43
    # Reference quirks, all load-bearing for checkpoint parity:
    # the quoted space row collapses to the empty string (so ' ' is absent)...
    assert " " not in table
    assert table[""] == 16
    # ...and '¡' is defined twice; the later row (178) wins.
    assert table["¡"] == 178


def test_restore_space_entry_compat_mode():
    table = load_phoneme_dictionary(
        DEFAULT_DICTIONARY_PATH, config={"restore_space_entry": True}
    )
    assert table[" "] == 16
    assert table[""] == 11  # the lost '"' row keeps the empty-string slot


def test_token_count_inference():
    # max index 178 -> vocab 179 (ref auto-grows n_token past the config's 178)
    assert infer_phoneme_dictionary_token_count(DEFAULT_DICTIONARY_PATH) == 179
    assert infer_phoneme_dictionary_token_count({"a": 3}) == 4
    assert infer_phoneme_dictionary_token_count(None) is None
    assert infer_phoneme_dictionary_token_count("/nonexistent/path.txt") is None


def test_cleaner_basic_and_unknown(caplog):
    tc = TextCleaner()
    ids = tc("Hello")
    table = tc.word_index_dictionary
    assert ids == [table[c] for c in "Hello"]
    # unknown phonemes are skipped
    assert tc("H☃i") == [table["H"], table["i"]]
    assert tc.pad_index == 0
    assert tc.inverse_mapping[17] == "A"


def test_cleaner_accepts_mapping():
    tc = TextCleaner({"x": 1, "y": 2, "$": 0})
    assert tc("xy") == [1, 2]
    assert tc.pad_index == 0


def test_resolution_precedence(tmp_path):
    asr_cfg = tmp_path / "asr.yml"
    dict_a = tmp_path / "a.txt"
    dict_a.write_text('"a",0\n')
    asr_cfg.write_text(
        "phoneme_maps_path: a.txt\nphoneme_dictionary:\n  lazy_loading: false\n"
    )
    src, cfg = resolve_phoneme_dictionary_settings(asr_config_path=str(asr_cfg))
    assert src == str(dict_a)
    assert cfg == {"lazy_loading": False}

    # data_params overrides the ASR config path
    src, cfg = resolve_phoneme_dictionary_settings(
        data_params={"phoneme_dict_path": "/x/y.txt", "phoneme_dictionary_config": {"shared_cache": True}},
        asr_config_path=str(asr_cfg),
    )
    assert src == "/x/y.txt"
    assert cfg == {"lazy_loading": False, "shared_cache": True}

    # default fallback
    src, _ = resolve_phoneme_dictionary_settings()
    assert src == DEFAULT_DICTIONARY_PATH
