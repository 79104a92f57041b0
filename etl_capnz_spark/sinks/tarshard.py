"""WebDataset-style tar shards: the interchange format multimodal
training loaders actually consume (one tar per shard; each sample is a
group of members sharing a basename — ``000042.txt`` + ``000042.json``).
Packing a corpus into tar shards and reading shards back are the two
ends of the training-data pipeline's last mile.

Scale shape: shard assignment is a deterministic md5 hash of the id
(dialect-portable, same trick as operators/sampling.hash_pct), so the
pack is ONE hash exchange on the shard key followed by a per-shard
Arrow-batched kernel (applyInPandas) that streams the group through
stdlib ``tarfile`` — no driver involvement, no Python-per-row. Unpack
is map-only (mapInPandas): each task opens its shards' bytes
independently, so a 100 TB corpus of 100 MB shards reads with
per-shard parallelism and zero shuffle.

Tar bytes are byte-DETERMINISTIC (members sorted by id; mtime=0,
uid=gid=0, empty uname/gname, USTAR format), so a re-run writes
identical shards — the same property every idempotent sink in this
repo leans on, pinned in tests. The compressed variants (.tar.gz
shards) are one ``gzip.compress`` away but deliberately not defaulted:
parquet-side compression and HTTP transport compression already cover
the storage story, and byte-determinism of gzip across zlib builds is
NOT guaranteed.
"""

from __future__ import annotations

import io
import json
import tarfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shard_of(id_col: str, n_shards: int):
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    return h % n_shards


def pack_tar_shards(
    df: DataFrame,
    id_col: str,
    content_col: str,
    meta_cols: list[str],
    n_shards: int,
) -> DataFrame:
    """Pack rows into ``n_shards`` deterministic tar shards.

    Each row becomes two members named by the zero-padded id:
    ``{id:012d}.txt`` (the content bytes; string content is UTF-8
    encoded, NULL packs as empty with the null-ness recorded in meta)
    and ``{id:012d}.json`` (sorted-key JSON of ``meta_cols``).

    Output: one row per shard — (shard_id bigint, n_entries bigint,
    tar_bytes binary). Wall format is USTAR with zeroed timestamps and
    ownership, members sorted by id: byte-identical across reruns and
    partitionings.
    """
    cols = [id_col, content_col, *meta_cols]
    staged = df.select(
        _shard_of(id_col, n_shards).alias("shard_id"), *cols
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for _, row in pdf.iterrows():
                rid = int(row[id_col])
                content = row[content_col]
                is_null = pd.isna(content)
                if is_null:
                    payload = b""
                elif isinstance(content, (bytes, bytearray)):
                    payload = bytes(content)
                else:
                    payload = str(content).encode("utf-8")
                meta = {c: _json_safe(row[c]) for c in meta_cols}
                meta["content_null"] = bool(is_null)
                mjson = json.dumps(meta, sort_keys=True).encode("utf-8")
                for suffix, data in ((".txt", payload), (".json", mjson)):
                    info = tarfile.TarInfo(name=f"{rid:012d}{suffix}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "n_entries": [len(pdf)],
                "tar_bytes": [buf.getvalue()],
            }
        )

    return staged.groupBy("shard_id").applyInPandas(
        _pack, "shard_id bigint, n_entries bigint, tar_bytes binary"
    )


def _json_safe(v):
    if pd.isna(v):
        return None
    if hasattr(v, "item"):
        return v.item()
    return v


def unpack_tar_shards(
    shards: DataFrame, tar_col: str = "tar_bytes"
) -> DataFrame:
    """Read tar shards back into one row per sample — the loader side.

    Map-only (mapInPandas): no shuffle, each task unpacks the shard
    bytes it already holds. Pairs ``*.txt`` content with its ``*.json``
    meta by basename; content whose meta says ``content_null`` comes
    back as NULL, completing the exact round-trip (pinned in tests and
    by the tar_shard_roundtrip oracle entry).

    Output: (member_id bigint, text string, meta string<json>).
    """

    def _unpack(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts, metas = [], [], []
            for blob in pdf[tar_col]:
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(blob)), mode="r"
                ) as tar:
                    payloads: dict[int, bytes] = {}
                    mjsons: dict[int, str] = {}
                    for member in tar.getmembers():
                        stem, _, suffix = member.name.partition(".")
                        data = tar.extractfile(member).read()
                        if suffix == "txt":
                            payloads[int(stem)] = data
                        else:
                            mjsons[int(stem)] = data.decode("utf-8")
                    for rid in sorted(payloads):
                        meta = mjsons.get(rid, "{}")
                        null = json.loads(meta).get("content_null")
                        ids.append(rid)
                        texts.append(
                            None
                            if null
                            else payloads[rid].decode("utf-8")
                        )
                        metas.append(meta)
            yield pd.DataFrame(
                {"member_id": ids, "text": texts, "meta": metas}
            )

    return shards.mapInPandas(
        _unpack, "member_id bigint, text string, meta string"
    )
