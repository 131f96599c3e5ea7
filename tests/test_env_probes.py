"""Environment-blocked capability probes (VERDICT r5 #8).

Two capabilities are correctly stubbed because the container lacks the
libraries (pip/apt are forbidden by the environment contract):

- transformWithState sessionization: the Python state-protocol worker
  needs ``google.protobuf`` (tests/test_sessionize.py importorskips).
- Real media codecs: ``functions/multimodal.py`` raises
  ``NotImplementedError`` for non-fake payloads; no PIL/av/cv2/soundfile.

These probes FAIL (not skip) the round the container gains a library,
so the stubs cannot silently outlive their justification: a failure
here means "implement the real path and un-skip the tests now".
"""

from __future__ import annotations

import importlib


def _importable(name: str) -> bool:
    # find_spec raises ModuleNotFoundError when a PARENT package is
    # absent (e.g. "google.protobuf" with no "google"), so probe by
    # importing and treating any failure as absence.
    try:
        importlib.import_module(name)
        return True
    except Exception:
        return False


def test_protobuf_absence_still_justifies_tws_skip():
    # If this fails, google.protobuf arrived: the importorskip in
    # tests/test_sessionize.py::test_streaming_sessionize_tws now runs
    # the real transformWithState path — confirm it passes, then delete
    # this probe and the COVERAGE.md "Environment-blocked" entry.
    assert not _importable("google.protobuf"), (
        "container gained protobuf — transformWithState is now testable"
    )


def test_codec_absence_still_justifies_multimodal_stub():
    # If this fails, a media library arrived: replace the
    # NotImplementedError slot in functions/multimodal.py with a real
    # decode (the Arrow plumbing around it is already tested), then
    # delete this probe and the COVERAGE.md "Environment-blocked" entry.
    present = [
        lib
        for lib in ("PIL", "av", "cv2", "soundfile", "imageio", "librosa")
        if _importable(lib)
    ]
    assert not present, (
        f"container gained media libraries {present} — implement the real "
        "decode path in functions/multimodal.py"
    )


def test_grpc_absence_still_justifies_local_pipelines_executor():
    # If this fails, grpc (+ protobuf) arrived: Spark Connect sessions
    # become constructible, so the Declarative Pipelines runner that
    # ships with Spark (pyspark.pipelines.cli → spark_connect_pipeline)
    # can replace declarative.materialize's local execution half.
    # Wire the real runner behind the same queries, then delete this
    # probe and the NOTES_r11 "Connect-blocked" entry.
    assert not _importable("grpc"), (
        "container gained grpc — run Declarative Pipelines through the "
        "real Spark Connect runner instead of the local executor"
    )
