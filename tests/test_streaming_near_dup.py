"""Streaming near-dup admission: the foreachBatch sink drops near
duplicates of previously-admitted content, replays are idempotent, a
crash at ANY point inside a micro-batch cannot double-admit (the
output/digests/bands triple commits as ONE atomic manifest entry), and
the end-to-end pipeline equals the batch reasoning over the same
micro-batches. Vocabulary is synthetic — the natural documents table
contains cross-id near-dups, so fixtures must own their collisions."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F, types as T

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.streaming.curation import (
    BANDS_MEMBER,
    DIGESTS_MEMBER,
    curate_stream_near_dup,
    near_dup_admitting_batch,
    read_admission_table,
    read_admitted,
)

WORDS = (
    "the quick brown fox jumps over a lazy dog while morning light "
    "covers the quiet harbor and boats drift toward the open water "
    "carrying crates of fresh fruit to the market square"
)  # 31 tokens, quality-passing
VARIANT = WORDS.replace("fresh fruit", "fresh bread")  # near-dup of WORDS
NOVEL = (
    "completely different subject matter here a report about glaciers "
    "melting in the northern ranges and what the survey teams recorded "
    "during the long expedition season last year overall"
)
SHORT = "tiny doc"  # below the shingle floor; exact-guard only


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out_ids(spark, root):
    return {r.doc_id for r in read_admitted(spark, root).collect()}


def _count(spark, root, member):
    return read_admission_table(spark, root, member).count()


class TestForeachBatchUnit:
    """Drive the foreachBatch function directly with static frames —
    the same code path the streaming engine calls."""

    @pytest.fixture()
    def sink(self, tmp_path):
        root = str(tmp_path / "admission")
        return root, near_dup_admitting_batch(root)

    def test_first_batch_admits_and_indexes(self, spark, sink):
        root, process = sink
        process(_df(spark, [(1, WORDS), (2, NOVEL)]), 0)
        assert _out_ids(spark, root) == {1, 2}
        assert _count(spark, root, DIGESTS_MEMBER) == 2
        assert _count(spark, root, BANDS_MEMBER) > 0

    def test_exact_and_near_dups_dropped(self, spark, sink):
        root, process = sink
        process(_df(spark, [(1, WORDS)]), 0)
        # batch 2: exact dup (10), near dup (11), novel (12)
        process(_df(spark, [(10, WORDS), (11, VARIANT), (12, NOVEL)]), 1)
        assert _out_ids(spark, root) == {1, 12}

    def test_replay_is_idempotent(self, spark, sink):
        root, process = sink
        batch = _df(spark, [(1, WORDS), (2, NOVEL)])
        process(batch, 0)
        n_out = read_admitted(spark, root).count()
        n_dig = _count(spark, root, DIGESTS_MEMBER)
        n_bands = _count(spark, root, BANDS_MEMBER)
        # re-delivered micro-batch: same content, same digests
        process(batch, 0)
        assert read_admitted(spark, root).count() == n_out
        assert _count(spark, root, DIGESTS_MEMBER) == n_dig
        assert _count(spark, root, BANDS_MEMBER) == n_bands

    def test_short_docs_use_exact_guard_only(self, spark, sink):
        root, process = sink
        process(_df(spark, [(1, SHORT)]), 0)
        process(_df(spark, [(2, SHORT), (3, "tiny other")]), 1)
        assert _out_ids(spark, root) == {1, 3}
        # sub-shingle docs never banded
        assert _count(spark, root, BANDS_MEMBER) == 0

    def test_in_batch_exact_dup_admits_once(self, spark, sink):
        root, process = sink
        process(_df(spark, [(5, WORDS), (6, WORDS)]), 0)
        assert _out_ids(spark, root) == {5}  # min id, the dedup_exact rule

    def test_in_batch_near_dup_admits_once(self, spark, sink):
        """VERDICT r9 #3: two first-seen NEAR variants in ONE
        micro-batch — each novel against the persisted index — must
        admit once (min id), and the loser must leave no digest or
        band rows behind."""
        root, process = sink
        process(_df(spark, [(7, WORDS), (8, VARIANT), (9, NOVEL)]), 0)
        assert _out_ids(spark, root) == {7, 9}
        assert _count(spark, root, DIGESTS_MEMBER) == 2
        # the loser's bands were filtered out of the committed index
        bands = read_admission_table(spark, root, BANDS_MEMBER)
        assert {r.corpus_id for r in bands.collect()} == {7, 9}
        # and a LATER delivery of the same variant still drops against
        # the winner's persisted bands
        process(_df(spark, [(20, VARIANT)]), 1)
        assert _out_ids(spark, root) == {7, 9}

    def test_in_batch_near_dup_replay_is_idempotent(self, spark, sink):
        root, process = sink
        batch = _df(spark, [(7, WORDS), (8, VARIANT)])
        process(batch, 0)
        assert _out_ids(spark, root) == {7}
        state = (
            _count(spark, root, DIGESTS_MEMBER),
            _count(spark, root, BANDS_MEMBER),
        )
        process(batch, 0)  # replay: same winners recomputed, all drop
        assert _out_ids(spark, root) == {7}
        assert (
            _count(spark, root, DIGESTS_MEMBER),
            _count(spark, root, BANDS_MEMBER),
        ) == state


class TestCrashExactlyOnce:
    """VERDICT r8 #3: kill the batch at every internal stage, replay,
    and require the final state to equal the uninterrupted run — no
    double-admitted output rows, no index divergence."""

    def _final_state(self, spark, root):
        return (
            _out_ids(spark, root),
            {
                r.digest
                for r in read_admission_table(
                    spark, root, DIGESTS_MEMBER
                ).collect()
            },
            _count(spark, root, BANDS_MEMBER),
        )

    def _uninterrupted(self, spark, tmp_path):
        root = str(tmp_path / "clean")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS), (2, NOVEL)]), 0)
        process(_df(spark, [(3, VARIANT), (4, SHORT)]), 1)
        return self._final_state(spark, root)

    @pytest.mark.parametrize("crash_at_stage", [1, 2, 3])
    def test_crash_during_member_staging_then_replay(
        self, spark, tmp_path, crash_at_stage
    ):
        """Crash after 0, 1, or 2 of the three member tables have been
        STAGED (the analog of the old layout's crash between separate
        appends): nothing of the crashed batch may be visible, and the
        replay must converge to the uninterrupted state."""
        want = self._uninterrupted(spark, tmp_path)
        root = str(tmp_path / "crashy")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS), (2, NOVEL)]), 0)

        real = ManifestCommit._stage_in
        calls = {"n": 0}

        def crashy(self, store, r, member, fn):
            calls["n"] += 1
            if calls["n"] == crash_at_stage:
                raise RuntimeError(f"killed at stage {crash_at_stage}")
            return real(self, store, r, member, fn)

        ManifestCommit._stage_in = crashy
        try:
            with pytest.raises(RuntimeError):
                process(_df(spark, [(3, VARIANT), (4, SHORT)]), 1)
        finally:
            ManifestCommit._stage_in = real
        # crashed batch fully invisible
        assert _out_ids(spark, root) == {1, 2}
        # replay (the streaming engine redelivers batch 1)
        process(_df(spark, [(3, VARIANT), (4, SHORT)]), 1)
        assert self._final_state(spark, root) == want

    def test_crash_before_log_entry_then_replay(self, spark, tmp_path):
        """All three members staged, crash before the put-if-absent
        log entry: still invisible, replay converges."""
        want = self._uninterrupted(spark, tmp_path)
        root = str(tmp_path / "crashy2")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS), (2, NOVEL)]), 0)

        real = ManifestCommit._commit

        def crashy(self, store, r, mutate):
            raise RuntimeError("killed before the log entry")

        ManifestCommit._commit = crashy
        try:
            with pytest.raises(RuntimeError):
                process(_df(spark, [(3, VARIANT), (4, SHORT)]), 1)
        finally:
            ManifestCommit._commit = real
        assert _out_ids(spark, root) == {1, 2}
        process(_df(spark, [(3, VARIANT), (4, SHORT)]), 1)
        assert self._final_state(spark, root) == want

    def test_crash_after_commit_replay_drops_everything(
        self, spark, tmp_path
    ):
        """Crash AFTER the atomic commit (before the checkpoint
        advances): the replayed batch hits the exact guard and admits
        nothing — same state as the uninterrupted run."""
        want = self._uninterrupted(spark, tmp_path)
        root = str(tmp_path / "crashy3")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS), (2, NOVEL)]), 0)
        batch = _df(spark, [(3, VARIANT), (4, SHORT)])
        process(batch, 1)  # committed; pretend the crash was after this
        process(batch, 1)  # replay
        assert self._final_state(spark, root) == want


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


def _t(minute: int) -> datetime:
    return datetime(2026, 1, 1, 12, minute, tzinfo=timezone.utc)


class TestEndToEnd:
    def test_stream_admits_only_first_variant(self, spark, tmp_path):
        """Three micro-batches landing as files: the quality gate, the
        exact stage, and the near-dup probe compose — only the first
        variant of each near-dup family survives, across batch
        boundaries and restarts."""
        input_dir = str(tmp_path / "in")
        root = str(tmp_path / "admission")
        batches = [
            [(1, WORDS, _t(0)), (2, "junk", _t(0))],
            [(3, VARIANT, _t(2)), (4, NOVEL, _t(2))],
            [(5, WORDS, _t(4))],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(f"{input_dir}/b{i}")

        def run():
            # one file per micro-batch so the cross-batch admission
            # semantics (index probe between batches) are exercised
            stream = (
                spark.readStream.schema(DOC_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{input_dir}/*")
            )
            q = curate_stream_near_dup(
                stream,
                admission_path=root,
                checkpoint_path=str(tmp_path / "ckpt"),
                trigger={"availableNow": True},
            )
            q.awaitTermination(120)

        run()
        admitted = _out_ids(spark, root)
        # 2 fails quality; 3 is a near-dup of 1; 5 an exact dup of 1
        assert admitted == {1, 4}
        # restart over the same input: checkpoint + content idempotency
        run()
        assert read_admitted(spark, root).count() == len(admitted)


class TestIndexCompaction:
    def test_compacts_and_preserves_admission_behavior(
        self, spark, tmp_path
    ):
        from redis_lsm_timeseries_spark.streaming.curation import (
            compact_admission_index,
        )

        root = str(tmp_path / "admission")
        process = near_dup_admitting_batch(root)
        # several batches -> several small files per index table
        process(_df(spark, [(1, WORDS)]), 0)
        process(_df(spark, [(2, NOVEL)]), 1)
        process(
            _df(spark, [(3, "a third entirely separate passage about "
                            "orchard harvests and the pressing of "
                            "apples into cider every autumn weekend")]),
            2,
        )
        commit = ManifestCommit()
        host = CommitHost(spark)
        dig_before = sorted(
            r.digest
            for r in read_admission_table(
                spark, root, DIGESTS_MEMBER
            ).collect()
        )
        n_bands = _count(spark, root, BANDS_MEMBER)
        assert commit.table_file_count(host, f"{root}/digests") >= 3
        done = compact_admission_index(spark, root)
        assert done["digests"] >= 3 and done["bands"] >= 3
        # contents identical, one manifest file each now
        assert dig_before == sorted(
            r.digest
            for r in read_admission_table(
                spark, root, DIGESTS_MEMBER
            ).collect()
        )
        assert _count(spark, root, BANDS_MEMBER) == n_bands
        assert commit.table_file_count(host, f"{root}/digests") == 1
        # second run is a no-op
        assert compact_admission_index(spark, root) == {
            "digests": 0, "bands": 0
        }
        # admission semantics unchanged through the compacted index:
        # replay of batch 1 content still admits nothing
        process(_df(spark, [(10, WORDS), (11, VARIANT)]), 3)
        admitted = _out_ids(spark, root)
        assert 10 not in admitted and 11 not in admitted

    def test_concurrent_sink_append_survives_compaction(
        self, spark, tmp_path
    ):
        """r10 conflict detection end-to-end: a micro-batch committing
        (leaselessly) between the compaction's conflict-baseline
        capture and its commit must never be dropped from the manifest
        — the rewrite conflicts, retries on fresh state, and the
        appended digest survives compacted."""
        from redis_lsm_timeseries_spark.streaming import curation as C

        root = str(tmp_path / "admission")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS)]), 0)
        process(_df(spark, [(2, NOVEL)]), 1)

        real_read = C.read_admission_table
        state = {"injected": False}

        def racing_read(spark_, path, member, fs=None,
                        predicates=None):
            # the first snapshot read of the digests member races a
            # sink batch landing RIGHT after the baseline was captured
            if member == DIGESTS_MEMBER and not state["injected"]:
                state["injected"] = True
                process(
                    _df(
                        spark,
                        [(3, "an unrelated report on tidal energy "
                             "projects along the estuary and the "
                             "turbines installed there last spring")],
                    ),
                    2,
                )
            return real_read(spark_, path, member, fs,
                             predicates=predicates)

        C.read_admission_table = racing_read
        try:
            done = C.compact_admission_index(spark, root)
        finally:
            C.read_admission_table = real_read
        assert done["digests"] >= 2
        digests = read_admission_table(
            spark, root, DIGESTS_MEMBER
        ).count()
        assert digests == 3  # the racing batch's digest survived
        assert _out_ids(spark, root) == {1, 2, 3}
        commit = ManifestCommit()
        host = CommitHost(spark)
        assert commit.table_file_count(host, f"{root}/digests") == 1

    def test_interrupted_compaction_is_invisible(self, spark, tmp_path):
        """Crash before the compaction's log entry: the table still
        reads from the pre-compaction manifest; the next compaction
        run finishes the job."""
        from redis_lsm_timeseries_spark.streaming.curation import (
            compact_admission_index,
        )

        root = str(tmp_path / "admission")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS)]), 0)
        process(_df(spark, [(2, NOVEL)]), 1)
        n = _count(spark, root, DIGESTS_MEMBER)

        real = ManifestCommit._commit

        def crashy(self, store, r, mutate):
            raise RuntimeError("killed mid-compaction")

        ManifestCommit._commit = crashy
        try:
            with pytest.raises(RuntimeError):
                compact_admission_index(spark, root)
        finally:
            ManifestCommit._commit = real
        assert _count(spark, root, DIGESTS_MEMBER) == n
        done = compact_admission_index(spark, root)
        assert done["digests"] >= 2
        assert _count(spark, root, DIGESTS_MEMBER) == n


class TestBloomPreProbe:
    """VERDICT r8 stretch: the per-compaction Bloom sidecar lets
    novel-content micro-batches skip the full digest-index scan —
    false-negative-free by construction, pure optimization on any
    miss/stale/oversize condition."""

    def _novel(self, i):
        return (
            f"entirely fresh passage number {i} about topic{i} with "
            f"its own unrepeated vocabulary trail{i}"
        )

    def test_skips_full_scan_after_compaction(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.streaming.curation import (
            compact_admission_index,
        )

        root = str(tmp_path / "admission")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS), (2, NOVEL)]), 0)
        process(_df(spark, [(3, self._novel(3))]), 1)
        # pre-sidecar, small batches scan the digest index through
        # the stats prune (r11) — the Bloom skip counter stays 0
        assert process.stats == {
            "bloom_skips": 0, "full_scans": 0, "pruned_scans": 2
        }
        compact_admission_index(spark, root)  # builds the sidecar
        # novel batches after compaction: tail is empty, all digests
        # miss the bloom -> no digest-index scan at all
        process(_df(spark, [(4, self._novel(4))]), 2)
        process(_df(spark, [(5, self._novel(5))]), 3)
        assert process.stats["bloom_skips"] == 2
        assert process.stats["pruned_scans"] == 2  # unchanged
        assert _out_ids(spark, root) == {1, 2, 3, 4, 5}

    def test_duplicate_content_hits_bloom_and_is_blocked(
        self, spark, tmp_path
    ):
        from redis_lsm_timeseries_spark.streaming.curation import (
            compact_admission_index,
        )

        root = str(tmp_path / "admission")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS)]), 0)
        compact_admission_index(spark, root)
        # exact dup of compacted content: bloom HITS -> full scan ->
        # correctly dropped (no false admission, ever)
        process(_df(spark, [(2, WORDS), (3, self._novel(3))]), 1)
        # both scans (pre-compaction + bloom-hit fallback) went
        # through the pruned path; neither was skipped
        assert process.stats["pruned_scans"] == 2
        assert process.stats["bloom_skips"] == 0
        assert _out_ids(spark, root) == {1, 3}

    def test_tail_files_still_probed_on_bloom_miss(
        self, spark, tmp_path
    ):
        """Content admitted AFTER the sidecar was built lives in tail
        files outside the covered set — a bloom-missing batch must
        still be checked against the tail, or post-compaction
        admissions would re-admit."""
        from redis_lsm_timeseries_spark.streaming.curation import (
            compact_admission_index,
        )

        root = str(tmp_path / "admission")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS)]), 0)
        compact_admission_index(spark, root)
        tail_doc = self._novel(7)
        process(_df(spark, [(7, tail_doc)]), 1)   # bloom skip, admitted
        assert process.stats["bloom_skips"] == 1
        # exact dup of the TAIL doc: misses the bloom (built before
        # doc 7), so the tail scan is what must block it
        process(_df(spark, [(8, tail_doc)]), 2)
        assert _out_ids(spark, root) == {1, 7}

    def test_stale_or_missing_sidecar_is_safe(self, spark, tmp_path):
        import os

        from redis_lsm_timeseries_spark.streaming.curation import (
            BLOOM_SIDECAR,
            compact_admission_index,
        )

        root = str(tmp_path / "admission")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS)]), 0)
        compact_admission_index(spark, root)
        # corrupt the sidecar: optimization silently disabled
        with open(f"{root}/{BLOOM_SIDECAR}", "w") as fh:
            fh.write("not json {")
        process(_df(spark, [(2, WORDS), (3, self._novel(3))]), 1)
        assert _out_ids(spark, root) == {1, 3}
        os.remove(f"{root}/{BLOOM_SIDECAR}")
        process(_df(spark, [(4, WORDS)]), 2)
        assert _out_ids(spark, root) == {1, 3}

    def test_sharded_build_matches_reference_shards(
        self, spark, tmp_path
    ):
        """r14 (VERDICT r13 #4): the sidecar is SHARDED — the build is
        still distributed (no driver collect of the digest table), but
        each task allocates only its own shards' bitmaps and each
        shard file byte-matches a hand-rolled per-shard reference
        build, so probe behavior is exactly the planted-digest truth."""
        import base64
        import json
        import os

        import pyspark.sql

        from redis_lsm_timeseries_spark.fs import LOCAL_FS
        from redis_lsm_timeseries_spark.streaming.curation import (
            BLOOM_SHARD_DIR,
            _bloom_hit,
            _bloom_positions,
            _bloom_shard,
            _load_bloom,
            build_digest_bloom,
        )

        root = str(tmp_path / "admission")
        process = near_dup_admitting_batch(root)
        # several commits -> a multi-file, multi-partition digest index
        for b, base in enumerate(range(0, 12, 3)):
            process(
                _df(
                    spark,
                    [(base + j, self._novel(base + j)) for j in range(3)],
                ),
                b,
            )
        digests = [
            r.digest
            for r in read_admission_table(
                spark, root, DIGESTS_MEMBER
            ).collect()
        ]
        assert len(digests) >= 8

        real_collect = pyspark.sql.DataFrame.collect

        def no_collect(df):
            raise AssertionError(
                "build_digest_bloom must not collect the digest table"
            )

        pyspark.sql.DataFrame.collect = no_collect
        try:
            meta = build_digest_bloom(spark, root)
        finally:
            pyspark.sql.DataFrame.collect = real_collect

        bloom = _load_bloom(root, LOCAL_FS)
        assert bloom.get("format") == 2 and "bits" not in bloom
        m = bloom["m_shard"]
        # hand-rolled reference shards
        want: dict = {}
        for d in digests:
            s = _bloom_shard(d)
            buf = want.setdefault(s, bytearray((m + 7) // 8))
            for p in _bloom_positions(d, m):
                buf[p >> 3] |= 1 << (p & 7)
        assert len(want) >= 2, "planted digests span multiple shards"
        assert sorted(want) == sorted(bloom["written"])
        shard_dir = f"{root}/{BLOOM_SHARD_DIR}/{bloom['dir']}"
        for s, buf in want.items():
            payload = json.loads(open(f"{shard_dir}/{s:03d}.json").read())
            assert base64.b64decode(payload["bits"]) == bytes(buf)
        # per-task allocation is bounded by shard size, not total m
        assert meta["m"] == m * bloom["shards"] and m * 8 < meta["m"]
        assert meta["n"] == len(digests) == bloom["n"]
        assert meta["shards_written"] == len(want)
        # probe truth: every planted digest hits; an unknown digest
        # in an EMPTY shard provably misses
        assert all(_bloom_hit(bloom, d) for d in digests)
        empty = next(
            s for s in range(bloom["shards"]) if s not in set(bloom["written"])
        )
        probe = 0
        while _bloom_shard(f"nope-{probe}") != empty:
            probe += 1
        assert not _bloom_hit(bloom, f"nope-{probe}")
        # a vanished shard file degrades to a HIT (fallback scan),
        # never a false negative
        victim = bloom["written"][0]
        os.remove(f"{shard_dir}/{victim:03d}.json")
        fresh = _load_bloom(root, LOCAL_FS)
        hit_digest = next(d for d in digests if _bloom_shard(d) == victim)
        assert _bloom_hit(fresh, hit_digest)

    def test_legacy_single_bitmap_sidecar_still_probes(
        self, spark, tmp_path
    ):
        """A pre-r14 single-bitmap sidecar written by an older build
        keeps probing until the next compaction rewrites it sharded."""
        import base64
        import json

        from redis_lsm_timeseries_spark.fs import LOCAL_FS
        from redis_lsm_timeseries_spark.streaming.curation import (
            BLOOM_SIDECAR,
            _bloom_hit,
            _bloom_positions,
            _load_bloom,
        )

        root = str(tmp_path / "admission")
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS)]), 0)
        m = 4096
        bits = bytearray((m + 7) // 8)
        for p in _bloom_positions("known", m):
            bits[p >> 3] |= 1 << (p & 7)
        LOCAL_FS.makedirs(root)
        with open(f"{root}/{BLOOM_SIDECAR}", "w") as fh:
            json.dump(
                {
                    "m": m, "k": 7, "n": 1, "files": [],
                    "bits": base64.b64encode(bytes(bits)).decode(),
                },
                fh,
            )
        bloom = _load_bloom(root, LOCAL_FS)
        assert _bloom_hit(bloom, "known")
        assert not _bloom_hit(bloom, "unknown-digest")


class TestAdmissionStats:
    def test_metadata_snapshot(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.streaming.curation import (
            admission_stats,
            compact_admission_index,
        )

        root = str(tmp_path / "admission")
        assert admission_stats(spark, root) == {"exists": False}
        process = near_dup_admitting_batch(root)
        process(_df(spark, [(1, WORDS)]), 0)
        process(_df(spark, [(2, NOVEL)]), 1)
        s = admission_stats(spark, root)
        assert s["exists"] and s["version"] == 1
        assert s["files"]["digests"] == 2 and s["files"]["output"] == 2
        assert "bloom" not in s  # not built yet
        compact_admission_index(spark, root)
        process(_df(spark, [(3, "a separate new passage about canals "
                               "and the locks that lift the barges")]), 2)
        s = admission_stats(spark, root)
        assert s["files"]["digests"] == 2  # 1 compacted + 1 tail
        assert s["bloom"]["n_digests"] == 2
        assert s["bloom"]["covered_files"] == 1
        assert s["bloom"]["tail_files"] == 1
