"""Property-based tests (hypothesis) for the pure-Python core that the
pandas plugin host depends on."""

import json
import string
from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from defenda_data_lake_spark.operators.intake import split_concatenated_json
from defenda_data_lake_spark.utils.dates import to_utc
from defenda_data_lake_spark.utils.json_tree import (
    deep_merge,
    enum_keys,
    get_by_path,
    lowercase_keys,
)

keys = st.text(string.ascii_letters + "_-@#", min_size=1, max_size=8)
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(2**31), 2**31),
    st.text(max_size=20),
)
json_values = st.recursive(
    scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(keys, inner, max_size=4),
    ),
    max_leaves=20,
)
json_objects = st.dictionaries(keys, json_values, max_size=6)


@given(json_objects)
@settings(max_examples=200, deadline=None)
def test_lowercase_keys_idempotent_and_preserves_structure(obj):
    once = lowercase_keys(obj)
    assert lowercase_keys(once) == once
    assert all(k == k.lower() for k in enum_keys(once))


@given(json_objects, json_objects)
@settings(max_examples=200, deadline=None)
def test_deep_merge_override_wins(base, override):
    merged = deep_merge(base, override)
    for k, v in override.items():
        if not (isinstance(v, dict) and isinstance(base.get(k), dict)):
            assert merged[k] == v
    for k in base:
        assert k in merged


@given(st.lists(json_objects, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_split_concatenated_json_roundtrip(objs):
    blob = "".join(json.dumps(o) for o in objs)
    parsed = [json.loads(b) for b in split_concatenated_json(blob)]
    assert parsed == objs


@given(st.integers(1, 2**31))
@settings(max_examples=200, deadline=None)
def test_to_utc_epoch_seconds(epoch):
    assert to_utc(epoch) == datetime.fromtimestamp(epoch, timezone.utc)


@given(st.integers(10**9, 2**31))
@settings(max_examples=200, deadline=None)
def test_to_utc_epoch_magnitude_heuristic(epoch):
    # the magnitude heuristic assumes a 10-digit seconds epoch
    # (reference EPOCH_MAGNITUDE=9 semantics): for epochs >= 1e9
    # (2001-2038) the ms and us forms scale back to the same instant
    got = to_utc(epoch)
    assert to_utc(epoch * 1000) == got
    assert to_utc(float(epoch * 1_000_000)) == got


shellish_keys = st.one_of(
    keys,
    st.sampled_from(
        ["details", "tags", "severity", "timestamp", "time", "date", "kind",
         "src", "ipaddress", "eventid", "plugins", "summary"]
    ),
)
shellish_objects = st.dictionaries(shellish_keys, json_values, max_size=6)


@given(shellish_objects)
@settings(max_examples=150, deadline=None)
def test_pipeline_host_contract_on_arbitrary_events(obj):
    """The host contract over ANY JSON object — including ones that
    collide with shell keys or plugin trigger fields: either the
    pipeline yields a shell-conformant event, or it raises and the
    Arrow host quarantines the record (reference semantics: a plugin
    exception marks the record ProcessingFailed; e.g. a non-dict
    pre-existing ``details`` makes the shell demotion crash there
    too)."""
    from defenda_data_lake_spark.operators.pipeline import (
        default_plugins,
        run_pipeline,
    )
    from defenda_data_lake_spark.schema import SHELL_FIELDS

    try:
        result = run_pipeline(obj, default_plugins())
    except Exception:
        return  # host quarantines (ProcessingFailed) — acceptable
    assert result is not None
    assert set(result.keys()) <= set(SHELL_FIELDS)
    for field in ("utctimestamp", "severity", "summary", "category", "source"):
        assert field in result
    # executed plugin names are appended after any pre-existing content;
    # the enrichment pass (ensure_eventid) always runs last
    assert result["plugins"][-1] == "ensure_eventid"
    assert "eventid" in result


@given(json_objects, st.lists(keys, min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_get_by_path_never_raises(obj, path_segs):
    # arbitrary paths on arbitrary trees: never throws; missing paths
    # yield the default
    sentinel = object()
    result = get_by_path(obj, ".".join(path_segs), sentinel)
    if len(path_segs) == 1:
        # single-segment path: must agree with plain dict lookup
        assert result is obj.get(path_segs[0], sentinel)


@given(
    st.integers(1, 8),
    st.integers(1, 8),
    st.sampled_from([1, 2, 3, 4]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_png_encode_decode_roundtrip(w, h, channels, rnd):
    from defenda_data_lake_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    pixels = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    out_w, out_h, out_ch, out_px = _decode_png(_encode_png(w, h, channels, pixels))
    assert (out_w, out_h, out_ch) == (w, h, channels)
    assert bytes(out_px) == pixels


@given(
    st.integers(1, 8),
    st.integers(1, 8),
    st.integers(1, 8),
    st.integers(1, 8),
    st.sampled_from([1, 3]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_resize_nearest_dims_and_identity(w, h, out_w, out_h, channels, rnd):
    from defenda_data_lake_spark.operators.multimodal import _resize_nearest

    pixels = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    out = _resize_nearest(w, h, channels, pixels, out_w, out_h)
    assert len(out) == out_w * out_h * channels
    if (out_w, out_h) == (w, h):
        assert out == pixels  # identity resize is exact


@given(
    st.lists(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=32),
        min_size=1,
        max_size=60,
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_bpe_learner_invariants(words, rnd):
    """Properties of the pure BPE core on arbitrary corpora: (a) the
    learned merge table is invariant under permutation of the word
    list (tie-breaks are a total order over counts, not list order);
    (b) tokenize_py output always reassembles to the word with no
    empty tokens; (c) token count never exceeds word length."""
    from defenda_data_lake_spark.operators.bpe import learn_bpe, tokenize_py

    wc = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    merges = learn_bpe(top, n_merges=8)
    shuffled = list(top)
    rnd.shuffle(shuffled)
    assert learn_bpe(shuffled, n_merges=8) == merges
    for w in wc:
        toks = tokenize_py(w, merges)
        assert "".join(toks) == w, (w, toks)
        assert all(toks), (w, toks)
        assert 1 <= len(toks) <= len(w)


@given(st.text(max_size=200))
@settings(max_examples=60, deadline=None)
def test_full_token_accounting_py_total_covers_everything(text):
    """The byte-fallback contract on arbitrary unicode text: totals
    are consistent, non-negative, and every non-whitespace char of the
    lowered text is accounted in exactly one bucket (BPE words,
    oversized runs, or fallback bytes >= one per char)."""
    import re

    from defenda_data_lake_spark.operators.bpe import (
        full_token_accounting_py,
        learn_bpe,
    )

    merges = learn_bpe([("the", 5), ("hello", 3)], n_merges=4)
    acc = full_token_accounting_py(text, merges)
    assert all(v >= 0 for v in acc.values())
    assert (
        acc["n_tokens_total"]
        == acc["n_tokens_bpe"] + acc["n_long_chars"] + acc["n_bytes_other"]
    )
    assert acc["n_vocab_words"] <= acc["n_words"] <= acc["n_tokens_bpe"] or (
        acc["n_words"] == 0 and acc["n_tokens_bpe"] == 0
    )
    lowered = text.lower()
    qual_chars = sum(
        len(w)
        for w in re.split("[^a-z]+", lowered)
        if w and len(w) <= 32
    )
    non_ws = len(re.sub("[ \t\n\r\f]", "", lowered))
    # the lowered non-whitespace chars decompose exactly into
    # qualifying-word chars, oversized-run chars, and everything else;
    # the fallback bucket must cover that remainder at >= 1 byte/char
    assert acc["n_long_chars"] + qual_chars <= non_ws
    other_chars = non_ws - qual_chars - acc["n_long_chars"]
    assert acc["n_bytes_other"] >= other_chars  # bytes >= chars (UTF-8)
