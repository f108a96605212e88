"""Training-data function library + config utility tests."""

import numpy as np
import pyarrow as pa
import pytest

from deltaray.config import expand_macros
from deltaray.functions.multimodal import (
    DecodeImage,
    ExtractAudioFeatures,
    SampleVideoFrames,
    synth_audio_table,
    synth_media_table,
)


def test_expand_macros():
    # ${key} substitution (DefaultMacroEvaluator.java analog)
    assert expand_macros("s3://${bucket}/x", {"bucket": "b"}) == "s3://b/x"
    with pytest.raises(KeyError):
        expand_macros("${missing}", {})


def test_decode_image_stub_and_strict():
    tbl = synth_media_table(8)
    out = DecodeImage()(tbl)
    assert out.num_rows == 8
    assert "features" in out.column_names
    assert "payload" not in out.column_names  # wide payload dropped
    assert len(out["features"][0]) == 8
    with pytest.raises(NotImplementedError):
        DecodeImage(strict=True)(tbl)


def test_audio_features_stub():
    tbl = synth_audio_table(8)
    out = ExtractAudioFeatures()(tbl)
    assert out.num_rows == 8
    assert len(out["mfcc"][0]) == 13
    # deterministic: same payload -> same features
    out2 = ExtractAudioFeatures()(tbl)
    assert out["mfcc"].equals(out2["mfcc"])


def test_video_frame_fanout():
    vids = synth_audio_table(5)
    out = SampleVideoFrames(frames_per_video=4)(vids)
    assert out.num_rows == 20  # one row per sampled frame
    assert sorted(set(out["frame_idx"].to_pylist())) == [0, 1, 2, 3]
    # frame timestamps inside the video duration
    assert max(out["ts_ms"].to_pylist()) < max(vids["duration_ms"].to_pylist())


def test_ngram_jaccard():
    from deltaray.functions.dedup import ngram_jaccard

    assert ngram_jaccard("abcdefgh", "abcdefgh") == 1.0
    assert ngram_jaccard("abcdefgh", "zzzzzzzz") == 0.0
    assert 0.0 < ngram_jaccard("abcdefghij", "abcdefghiX") < 1.0


def test_minhash_dedup_docs_drops_near_dups():
    import ray.data

    from deltaray.functions.dedup import minhash_dedup_docs

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight looking for dinner")
    texts = [base, base + " extra", "completely different content about "
             "machine learning pipelines and distributed systems at scale",
             base]
    tbl = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(texts)})
    out = minhash_dedup_docs(ray.data.from_arrow(tbl), jaccard_threshold=0.5)
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert 1 in kept          # min id of the near-dup cluster survives
    assert 3 in kept          # unrelated doc survives
    assert 4 not in kept      # exact dup of 1 dropped
    assert len(kept) <= 3
