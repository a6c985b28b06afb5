"""File-set sync tests (SURVEY §3.3): anti-join copy plan, semi-join stats,
dry-run, actual copy execution, idempotent re-sync, and hash-compare mode."""

from __future__ import annotations

import os

from database_synchronize_tool_spark.sources.filesync import (
    list_files_distributed,
    list_hadoop_files,
    list_local_files,
    plan_copy,
    sync_file_sets,
)


def seed(root, files: dict[str, str]) -> None:
    for name, content in files.items():
        p = os.path.join(root, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(content)


def test_plan_counts(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1", "sub/b.txt": "2", "c.txt": "3"})
    seed(dst, {"a.txt": "1"})
    plan = plan_copy(list_local_files(spark, src), list_local_files(spark, dst))
    assert plan.stats() == {"total_files": 3, "new_files": 2, "existing_files": 1}
    names = sorted(r["name"] for r in plan.to_copy.collect())
    assert names == ["c.txt", os.path.join("sub", "b.txt")]


def test_dry_run_copies_nothing(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1"})
    os.makedirs(dst)
    stats = sync_file_sets(spark, src, dst, dry_run=True)
    assert stats["new_files"] == 1
    assert os.listdir(dst) == []


def test_sync_copies_and_is_idempotent(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1", "sub/b.txt": "22"})
    os.makedirs(dst)
    stats = sync_file_sets(spark, src, dst)
    assert stats["new_files"] == 2
    assert open(os.path.join(dst, "sub", "b.txt")).read() == "22"
    # re-sync: everything exists, nothing to copy
    stats2 = sync_file_sets(spark, src, dst)
    assert stats2 == {"total_files": 2, "new_files": 0, "existing_files": 2}


def test_distributed_listing_matches_local_on_many_file_tree(spark, tmp_path):
    # 60 files across 12 nested dirs — above the parallel-discovery threshold
    # shape the distributed path is for
    root = str(tmp_path / "tree")
    seed(
        root,
        {
            f"d{d}/sub{d % 3}/f{i}.dat": "x" * (d * 10 + i + 1)
            for d in range(12)
            for i in range(5)
        },
    )
    dist = {
        (r["name"], r["size"])
        for r in list_files_distributed(spark, root).collect()
    }
    local = {
        (r["name"], r["size"]) for r in list_local_files(spark, root).collect()
    }
    assert dist == local
    assert len(dist) == 60


def test_distributed_listing_prunes_content_column(spark, tmp_path):
    # the scan must read metadata only: `content` absent from ReadSchema
    root = str(tmp_path / "p")
    seed(root, {"a.bin": "payload"})
    plan = list_files_distributed(spark, root)._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


def test_distributed_listing_glob_filter(spark, tmp_path):
    root = str(tmp_path / "g")
    seed(root, {"a.parquet": "1", "b.txt": "2", "sub/c.parquet": "3"})
    names = sorted(
        r["name"]
        for r in list_files_distributed(spark, root, pattern="*.parquet").collect()
    )
    assert names == ["a.parquet", os.path.join("sub", "c.parquet")]


def test_plan_copy_over_distributed_listings(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1", "sub/b.txt": "2", "c.txt": "3"})
    seed(dst, {"a.txt": "1"})
    plan = plan_copy(
        list_files_distributed(spark, src), list_files_distributed(spark, dst)
    )
    assert plan.stats() == {"total_files": 3, "new_files": 2, "existing_files": 1}


def test_list_hadoop_files_delegates_distributed(spark, tmp_path):
    root = str(tmp_path / "h")
    seed(root, {"x.txt": "abc"})
    rows = list_hadoop_files(spark, root).collect()
    assert [(r["name"], r["size"]) for r in rows] == [("x.txt", 3)]


def test_confirm_flow_executes_on_y(spark, tmp_path):
    from database_synchronize_tool_spark.cli import sync_with_confirmation

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1", "b.txt": "2"})
    os.makedirs(dst)
    prompts = []

    def confirm(prompt):
        prompts.append(prompt)
        return "y"

    result = sync_with_confirmation(spark, src, dst, confirm=confirm)
    assert result["executed"] and not result["cancelled"]
    assert result["new_files"] == 2
    assert len(prompts) == 1 and "(y/N)" in prompts[0]
    assert sorted(os.listdir(dst)) == ["a.txt", "b.txt"]


def test_confirm_flow_cancels_on_anything_else(spark, tmp_path):
    from database_synchronize_tool_spark.cli import sync_with_confirmation

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1"})
    os.makedirs(dst)
    result = sync_with_confirmation(spark, src, dst, confirm=lambda _: "no")
    assert result["cancelled"] and not result["executed"]
    assert result["new_files"] == 1  # the dry-run report still happened
    assert os.listdir(dst) == []  # but nothing copied


def test_cli_yes_flag_skips_prompt(spark, tmp_path):
    from database_synchronize_tool_spark.cli import main

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1"})
    os.makedirs(dst)

    def explode(_prompt):  # must never be called with --yes
        raise AssertionError("prompted despite --yes")

    rc = main([src, dst, "--yes"], spark=spark, confirm=explode)
    assert rc == 0
    assert os.listdir(dst) == ["a.txt"]


def test_cli_dry_run_never_prompts_or_copies(spark, tmp_path):
    from database_synchronize_tool_spark.cli import main

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1"})
    os.makedirs(dst)

    def explode(_prompt):
        raise AssertionError("prompted during --dry-run")

    rc = main([src, dst, "--dry-run"], spark=spark, confirm=explode)
    assert rc == 0
    assert os.listdir(dst) == []


def test_cli_cancelled_exit_code(spark, tmp_path):
    from database_synchronize_tool_spark.cli import main

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1"})
    os.makedirs(dst)
    rc = main([src, dst], spark=spark, confirm=lambda _: "")
    assert rc == 1
    assert os.listdir(dst) == []


def test_name_size_mode_recopies_changed(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "longer-content"})
    seed(dst, {"a.txt": "x"})  # same name, different size
    # parity mode (names only): nothing to copy — reference behavior
    assert sync_file_sets(spark, src, dst, dry_run=True)["new_files"] == 0
    # name_size mode: size mismatch -> re-copy (documented README intent)
    stats = sync_file_sets(spark, src, dst, compare="name_size")
    assert stats["new_files"] == 1
    assert open(os.path.join(dst, "a.txt")).read() == "longer-content"


def test_hash_mode_recopies_modified_same_size(spark, tmp_path):
    # the case only a content hash can catch: same name AND same size,
    # different bytes (the reference README's claimed MD5 mode, made real)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "aa", "b.txt": "zz"})
    seed(dst, {"a.txt": "ab", "b.txt": "zz"})  # a.txt modified in place
    assert sync_file_sets(spark, src, dst, dry_run=True, compare="name_size")[
        "new_files"
    ] == 0
    stats = sync_file_sets(spark, src, dst, compare="hash")
    assert stats == {"total_files": 2, "new_files": 1, "existing_files": 1}
    assert open(os.path.join(dst, "a.txt")).read() == "aa"
    # converged: re-sync in hash mode finds nothing to copy
    assert sync_file_sets(spark, src, dst, compare="hash")["new_files"] == 0


def test_hash_listing_digest_matches_md5(spark, tmp_path):
    import hashlib

    from database_synchronize_tool_spark.sources.filesync import list_files_with_hash

    root = str(tmp_path / "h")
    seed(root, {"x.bin": "some-bytes", "sub/y.bin": "other"})
    got = {r["name"]: r["md5"] for r in list_files_with_hash(spark, root).collect()}
    want = {
        name: hashlib.md5(
            open(os.path.join(root, name), "rb").read()
        ).hexdigest()
        for name in got
    }
    assert got == want and len(got) == 2


def test_hash_join_never_ships_content(spark, tmp_path):
    # scale shape: the binaryFile scan must read bytes (hashing needs them),
    # but only the 32-char digest may cross into the join/shuffle — content
    # stays confined to the scan + the md5 projection directly above it
    from database_synchronize_tool_spark.sources.filesync import list_files_with_hash

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "aa"})
    seed(dst, {"a.txt": "ab"})
    plan = plan_copy(
        list_files_with_hash(spark, src),
        list_files_with_hash(spark, dst),
        compare="hash",
    )
    txt = plan.to_copy._jdf.queryExecution().executedPlan().toString()
    assert "md5" in txt
    for line in txt.splitlines():
        if "content#" in line:
            # scan-stage nodes only: the scan itself, the md5 projection,
            # and the pushed-down join-key null filter — never a shuffle,
            # sort, or join operator
            assert any(k in line for k in ("FileScan", "Project", "Filter")), line
            assert not any(k in line for k in ("Exchange", "Join", "Sort")), line


def test_plan_copy_stats_single_job(spark, tmp_path, monkeypatch):
    # all three counters must come from ONE aggregation action, not three
    # separate count() jobs re-running the listing+join per counter
    from pyspark.sql import DataFrame

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    seed(src, {"a.txt": "1", "b.txt": "2", "c.txt": "3"})
    seed(dst, {"a.txt": "1", "d.txt": "4"})
    s, d = list_local_files(spark, src), list_local_files(spark, dst)

    def banned_count(self):
        raise AssertionError("plan_copy ran a per-counter count() job")

    monkeypatch.setattr(DataFrame, "count", banned_count)
    plan = plan_copy(s, d)
    monkeypatch.undo()
    assert plan.stats() == {"total_files": 3, "new_files": 2, "existing_files": 1}


def test_hash_listing_of_missing_root_is_empty_not_an_error(spark, tmp_path):
    # first sync into a fresh destination: hash mode must list empty like
    # the local lister's empty walk, not abort with PATH_NOT_FOUND
    from database_synchronize_tool_spark.sources.filesync import (
        list_files_distributed,
        list_files_with_hash,
    )

    missing = str(tmp_path / "does_not_exist_yet")
    hashed = list_files_with_hash(spark, missing)
    assert hashed.count() == 0
    assert hashed.columns == ["name", "size", "mtime", "md5"]
    assert list_files_distributed(spark, missing).count() == 0
