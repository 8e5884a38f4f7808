"""Host-signature guard on the persistent compilation cache.

XLA:CPU cache entries are AOT machine code whose cache key omits the host
feature set; `pdunet_tpu/utils/cache.py` segregates by a flags fingerprint
and additionally stamps each cache dir with a richer host signature,
rotating the dir aside when the signature changes (observed: two hosts with
identical cpuinfo flags but different LLVM tuning features).
"""

import os

from pdunet_tpu.utils import cache


def test_signature_is_stable_and_nonempty():
    sig = cache._host_signature()
    assert sig and sig == cache._host_signature()


def test_fresh_dir_is_stamped(tmp_path):
    d = str(tmp_path / "c")
    os.makedirs(d)
    cache._adopt_or_rotate(d)
    with open(os.path.join(d, cache._MARKER)) as f:
        assert f.read().strip() == cache._host_signature()


def test_unmarked_dir_is_adopted_with_entries(tmp_path):
    # A dir that predates the marker (written by this host earlier in the
    # round) keeps its warm entries.
    d = str(tmp_path / "c")
    os.makedirs(d)
    (tmp_path / "c" / "entry").write_text("x")
    cache._adopt_or_rotate(d)
    assert os.path.exists(os.path.join(d, "entry"))
    assert os.path.exists(os.path.join(d, cache._MARKER))


def test_mismatched_marker_rotates_dir_aside(tmp_path):
    d = str(tmp_path / "c")
    os.makedirs(d)
    with open(os.path.join(d, cache._MARKER), "w") as f:
        f.write("deadbeef00000000\n")
    (tmp_path / "c" / "entry").write_text("x")
    cache._adopt_or_rotate(d)
    # fresh dir, stamped for this host, old entries unreachable but kept
    with open(os.path.join(d, cache._MARKER)) as f:
        assert f.read().strip() == cache._host_signature()
    assert not os.path.exists(os.path.join(d, "entry"))
    assert os.path.exists(str(tmp_path / "c.stale-deadbeef" / "entry"))


def test_matching_marker_is_a_noop(tmp_path):
    d = str(tmp_path / "c")
    os.makedirs(d)
    cache._adopt_or_rotate(d)
    (tmp_path / "c" / "entry").write_text("x")
    cache._adopt_or_rotate(d)
    assert os.path.exists(os.path.join(d, "entry"))
