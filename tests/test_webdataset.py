"""WebDataset tar-shard sink/source: deterministic bytes, layout
invariance, binary members, loader-convention tar headers."""

from __future__ import annotations

import glob
import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from hdp2_5_hive_spark.sources import webdataset_py as wd


def _md5s(path: str) -> dict[str, str]:
    return {
        os.path.basename(p): hashlib.md5(
            open(p, "rb").read()
        ).hexdigest()
        for p in sorted(glob.glob(os.path.join(path, "shard-*.tar")))
    }


def test_webdataset_reexport_is_byte_identical(spark, tmp_path):
    """Same table → byte-identical shards, regardless of the input's
    partition layout (md5-keyed shard placement + in-shard key sort +
    pinned tar headers). This is what makes the export resumable and
    diffable at warehouse scale."""
    rows = [(i, f"doc {i} text", "en" if i % 2 else "de") for i in range(97)]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    n1 = wd.write_webdataset(
        df.repartition(7), d1, "id", {"text": "txt", "lang": "cls"}, n_shards=4
    )
    n2 = wd.write_webdataset(
        df.coalesce(1), d2, "id", {"text": "txt", "lang": "cls"}, n_shards=4
    )
    assert n1 == n2 == 97
    a, b = _md5s(d1), _md5s(d2)
    assert a and list(a.values()) == [b[k] for k in a]
    # placement matches the documented md5 rule
    with tarfile.open(os.path.join(d1, sorted(a)[0]), "r") as tar:
        for m in tar:
            key = m.name.rsplit(".", 1)[0]
            assert wd._shard_of(key, 4) == int(
                sorted(a)[0].split("-")[1].split(".")[0]
            )
            assert m.mtime == 0 and m.uid == 0 and m.uname == ""


def test_webdataset_binary_members_round_trip(spark, tmp_path):
    """Binary columns pass through raw (the image/audio member case);
    string members decode UTF-8; undeclared extensions are skipped on
    read like a webdataset loader's decode contract."""
    rows = [
        (i, bytes([i % 256, 255 - i % 256, 0x89]), f"meta-{i}")
        for i in range(23)
    ]
    df = spark.createDataFrame(rows, "id long, img binary, note string")
    d = str(tmp_path / "wds")
    wd.write_webdataset(
        df, d, "id", {"img": "png", "note": "json"}, n_shards=2
    )
    back = wd.read_webdataset(spark, d, {"png": "binary"}).collect()
    got = {int(r.key): bytes(r.png) for r in back}
    assert got == {i: bytes([i % 256, 255 - i % 256, 0x89]) for i in range(23)}


def test_webdataset_no_inprogress_left_and_missing_raises(spark, tmp_path):
    d = str(tmp_path / "wds")
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    wd.write_webdataset(df, d, "id", {"text": "txt"}, n_shards=2)
    assert not glob.glob(os.path.join(d, "*.inprogress"))
    with pytest.raises(FileNotFoundError):
        wd.read_webdataset(spark, str(tmp_path / "nope"), {"txt": "string"})


def test_shard_parse_mutation_fuzz_never_leaks_tar_errors(tmp_path):
    """Corrupt-input contract (r13): 150 seeded mutations of a valid
    shard through the per-shard parser — every outcome is parsed
    rows, ValueError, or EOFError; tarfile.ReadError/TarError must
    not leak (one bad shard = one loud actionable error)."""
    import io
    import random
    import tarfile as _tarfile

    from hdp2_5_hive_spark.sources.webdataset_py import _parse_shard

    # build a small valid shard by hand
    shard = tmp_path / "shard-000000.tar"
    with _tarfile.open(shard, "w") as tar:
        for key, txt in (("a", b"hello"), ("b", b"world")):
            ti = _tarfile.TarInfo(name=f"{key}.txt")
            ti.size = len(txt)
            tar.addfile(ti, io.BytesIO(txt))
    good = shard.read_bytes()
    order, rows = _parse_shard(str(shard), {"txt": "string"})
    assert order == ["a", "b"] and rows["a"]["txt"] == "hello"

    rng = random.Random(0xFADE)
    mutant = tmp_path / "mutant.tar"
    outcomes = {"ok": 0, "err": 0}
    for _ in range(150):
        base = bytearray(good)
        kind = rng.randrange(3)
        if kind == 0 and len(base) > 1:
            base = base[: rng.randrange(1, len(base))]
        elif kind == 1:
            for _ in range(rng.randrange(1, 6)):
                i = rng.randrange(len(base))
                base[i] ^= 1 << rng.randrange(8)
        else:
            i = rng.randrange(len(base))
            base[i : i + 8] = bytes(
                rng.randrange(256) for _ in range(8)
            )
        mutant.write_bytes(bytes(base))
        try:
            _parse_shard(str(mutant), {"txt": "string"})
            outcomes["ok"] += 1
        except (ValueError, EOFError):
            outcomes["err"] += 1
        # anything else (tarfile.TarError, UnicodeDecodeError is a
        # ValueError so fine) propagates and fails the test
    assert outcomes["err"] > 0, outcomes
