"""Round-12 object-store emulation pins (r11 verdict item 5): the
sidecar and manifest CAS protocols run UNCHANGED over FakeObjectStore —
an I/O surface of exactly LIST/GET/PUT/PUT-IF-ABSENT/DELETE/HEAD, no
rename, no link, no in-place rewrite — including the existing
two-process contention soak."""

import json
import os
import subprocess
import sys

import pytest


@pytest.fixture()
def fake_store():
    from hepop_spark.storage import objstore

    prev = objstore.backend()
    store = objstore.FakeObjectStore()
    objstore.set_backend(store)
    try:
        yield store
    finally:
        objstore.set_backend(prev)


class TestFakeObjectStoreSemantics:
    def test_conditional_put_and_verbs(self, tmp_path, fake_store):
        from hepop_spark.storage.objstore import (
            FakeObjectStore,
            PreconditionFailed,
        )

        st = fake_store
        key = str(tmp_path / "k" / "v1.json")
        assert st.put_if_absent(key, b"a") is True
        assert st.put_if_absent(key, b"b") is False  # CAS loses
        assert st.get(key) == b"a"  # loser never clobbers
        st.put(key, b"c")  # unconditional put overwrites
        assert st.get(key) == b"c"
        # etag CAS (completeness; protocols never need it)
        tag = FakeObjectStore.etag(b"c")
        assert st.put_if_match(key, b"d", tag) == FakeObjectStore.etag(b"d")
        with pytest.raises(PreconditionFailed):
            st.put_if_match(key, b"e", tag)  # stale etag
        st.delete(key)
        st.delete(key)  # idempotent
        assert st.get(key) is None
        assert st.mtime(key) is None
        assert st.list(str(tmp_path / "k")) == []

    def test_fake_and_local_share_one_tree(self, tmp_path, fake_store):
        """Objects written through the fake read through the local
        backend and vice versa — migration-safe, and what lets the
        two-process soak mix backends."""
        from hepop_spark.storage.objstore import LocalFsBackend

        key = str(tmp_path / "t" / "x.json")
        fake_store.put(key, b"via-fake")
        assert LocalFsBackend().get(key) == b"via-fake"
        LocalFsBackend().put(key, b"via-local")
        assert fake_store.get(key) == b"via-local"


class TestSidecarOverObjectStore:
    def test_update_probe_gc_cycle(self, tmp_path, fake_store):
        """A full sidecar lifecycle (publish, re-publish, merge, GC,
        probe) over the object-store verb surface only — and the verb
        counter proves the protocol actually went through it."""
        from hepop_spark.storage import sidecar

        base = str(tmp_path / "t")
        os.makedirs(base)
        for i in range(18):  # past the GC backstop threshold
            sidecar.update_entries(
                base, "bloom", "key",
                {f"shard={i % 4}/f{i}.parquet": {"m": 1024, "bits": "1"}})
        got = sidecar.load_entries(base, "bloom", "key")
        assert len(got) == 18
        d = sidecar.sidecar_dir(base, "bloom", "key")
        assert len(sidecar._head_versions(d)) <= (
            sidecar.KEEP_HEADS + sidecar.GC_SLACK)
        c = fake_store.counts
        assert c["put_if_absent"] >= 18  # every head publish is a CAS
        assert c["put"] > 0 and c["list"] > 0 and c["get"] > 0
        # the GC ran at least once -> deletes of superseded heads
        assert c["delete"] > 0

    def test_two_processes_soak_over_fake_store(self, tmp_path,
                                                fake_store):
        """The r09/r10 done-criterion soak re-run over the emulated
        store: two OS processes (no shared lock, no shared Python
        state) publish 30 updates each into ONE tree, the child forced
        onto FakeObjectStore via HEPOP_OBJSTORE=fake, the parent via
        set_backend. Every file both planted must be indexed."""
        base = tmp_path / "t"
        base.mkdir()
        script = tmp_path / "writer_b.py"
        script.write_text(_FAKE_WRITER_SCRIPT)
        n = 30
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {**os.environ, "HEPOP_OBJSTORE": "fake"}
        proc = subprocess.Popen(
            [sys.executable, str(script), str(base), "w2", str(n), repo],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        from hepop_spark.storage import sidecar

        try:
            for i in range(n):
                sidecar.update_entries(
                    base_path=str(base), kind="bloom", col="key",
                    new_entries={
                        f"shard={i % 4}/w1_{i}.parquet":
                        {"m": 1024, "bits": "1"}})
        finally:
            out, err = proc.communicate(timeout=120)
        assert proc.returncode == 0, err.decode()[-800:]
        assert b"DONE backend=fake-objstore" in out
        got = sidecar.load_entries(str(base), "bloom", "key")
        want = ({f"shard={i % 4}/w1_{i}.parquet" for i in range(n)}
                | {f"shard={i % 4}/w2_{i}.parquet" for i in range(n)})
        assert set(got) == want  # no lost update, either direction
        v, _head = sidecar.load_head(str(base), "bloom", "key")
        assert v >= 2 * n  # every update committed its own version
        assert fake_store.counts["put_if_absent"] >= n


_FAKE_WRITER_SCRIPT = """\
import os
import sys

os.environ["HEPOP_OBJSTORE"] = "fake"  # before any hepop_spark import
base, name, n, repo = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
sys.path.insert(0, repo)
from hepop_spark.storage import objstore, sidecar

assert objstore.backend().name == "fake-objstore"
for i in range(n):
    sidecar.update_entries(
        base_path=base, kind="bloom", col="key",
        new_entries={
            f"shard={i % 4}/{name}_{i}.parquet": {"m": 1024, "bits": "2"}})
print(f"DONE backend={objstore.backend().name}")
"""


class TestManifestOverObjectStore:
    def test_manifest_cas_conflict_and_read(self, tmp_path, fake_store):
        """The manifest version publish is the same conditional put:
        racing the SAME prev_version raises ManifestConflict for the
        loser and never clobbers the winner's committed version."""
        from hepop_spark.storage import manifest

        td = str(tmp_path / "tbl")
        os.makedirs(os.path.join(td, manifest.MANIFEST_DIR))
        v1 = manifest._publish(td, ["a.parquet"], {}, 0)
        assert v1 == 1
        with pytest.raises(manifest.ManifestConflict):
            manifest._publish(td, ["b.parquet"], {}, 0)  # stale prev
        got = manifest.latest(td)
        assert got is not None and got[1]["files"] == ["a.parquet"]
        v2 = manifest._publish(td, ["a.parquet", "b.parquet"], {}, v1)
        assert v2 == 2
        assert manifest.live_files(td) == ["a.parquet", "b.parquet"]
        assert fake_store.counts["put_if_absent"] >= 3

    def test_serve_tree_reads_back_on_local_backend(self, tmp_path,
                                                    fake_store):
        """A store tree built entirely over the fake backend must read
        identically once the default local backend is restored — the
        object layout IS the layout."""
        from hepop_spark.storage import objstore, sidecar

        base = str(tmp_path / "t")
        os.makedirs(base)
        sidecar.update_entries(
            base, "zone", "v",
            {"p/a.parquet": {"lo": 1.0, "hi": 2.0}})
        objstore.set_backend(objstore.LocalFsBackend())
        got = sidecar.load_entries(base, "zone", "v")
        assert got == {"p/a.parquet": {"lo": 1.0, "hi": 2.0}}


class TestHeadDocumentShape:
    def test_head_is_valid_json_object(self, tmp_path, fake_store):
        """The CAS-published head must be a complete JSON document in a
        single PUT (object stores have no partial writes to hide
        behind)."""
        from hepop_spark.storage import sidecar

        base = str(tmp_path / "t")
        os.makedirs(base)
        sidecar.update_entries(base, "bloom", "k",
                               {"p/x.parquet": {"m": 8, "bits": "1"}})
        d = sidecar.sidecar_dir(base, "bloom", "k")
        v = sidecar._head_versions(d)[-1]
        doc = json.loads(
            fake_store.get(os.path.join(d, f"head_v{v}.json")))
        assert doc["version"] == v and "segments" in doc
