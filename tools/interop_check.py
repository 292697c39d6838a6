#!/usr/bin/env python3
"""Independent-reader interop check for graft's table formats.

This is a SECOND IMPLEMENTATION of the DeltaLite / IcebergLite read
paths, written in Python against pyarrow only (no graft code, no Spark):
it replays the Delta log (JSON commits + parquet checkpoint +
`_last_checkpoint`), applies deletion-vector sidecars, injects partition
values from add-action metadata; and walks the Iceberg metadata tree
(version-hint -> vN.metadata.json -> manifest list -> manifests),
resolves columns BY PARQUET FIELD-ID against the current schema, and
applies position-delete files. The reconstructed rows are diffed against
graft's own snapshot dump (written by `graft.tools.InteropDump`).

The container has no delta-rs / pyiceberg (zero egress), so this is the
closest available stand-in for a foreign reader: any private assumption
baked into the Scala writer that is not derivable from the on-disk
protocol shows up here as a diff.

Usage:
  sbt 'runMain graft.tools.InteropDump /root/testdata/sf0.01 /tmp/interop'
  python3 tools/interop_check.py /tmp/interop

Validation tool only — not part of the library (the library is Scala).
"""
import glob
import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def fail(msg):
    print(f"FAIL {msg}")
    sys.exit(1)


def norm_rows(df):
    """Rows as sorted tuples of strings, NaN/None unified."""
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    return sorted(tuple(str(v) for v in row) for row in df.values.tolist())


# ---------------------------------------------------------------- Delta

def spark_schema_types(schema_str):
    """column -> Spark type name, from the log's schemaString."""
    return {f["name"]: f["type"]
            for f in json.loads(schema_str)["fields"]}


def typed_part_value(raw, spark_type):
    if raw is None:
        return None
    if spark_type in ("byte", "short", "integer", "long"):
        return int(raw)
    if spark_type in ("float", "double"):
        return float(raw)
    return raw  # string-ish (incl. date/timestamp renderings)


def replay_delta(table):
    """Independent log replay -> (schemaString, partCols, live adds)."""
    log = os.path.join(table, "_delta_log")
    live, schema_str, part_cols, start = {}, None, [], 0
    lc = os.path.join(log, "_last_checkpoint")
    if os.path.exists(lc):
        v = json.load(open(lc))["version"]
        cp = os.path.join(log, f"{v:020d}.checkpoint.parquet")
        if not os.path.exists(cp):
            fail(f"_last_checkpoint points at missing {cp}")
        rows = pq.read_table(cp).to_pylist()
        for r in rows:
            md = r.get("metaData")
            if md:
                schema_str = md["schemaString"]
                part_cols = list(md.get("partitionColumns") or [])
            a = r.get("add")
            if a:
                dv = a.get("deletionVector") or {}
                live[a["path"]] = {
                    "pv": dict(a.get("partitionValues") or {}),
                    "dv": dv.get("pathOrInlineDv"),
                }
            pr = r.get("protocol")
            if pr:
                assert pr["minReaderVersion"] >= 1
        start = v + 1
        print(f"  delta: checkpoint at v{v} "
              f"({len(live)} adds, schema {'ok' if schema_str else 'MISSING'})")
    versions = sorted(
        int(os.path.basename(p)[:20])
        for p in glob.glob(os.path.join(log, "*.json"))
        if os.path.basename(p)[:20].isdigit())
    for v in [x for x in versions if x >= start]:
        with open(os.path.join(log, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                n = json.loads(line)
                if "metaData" in n:
                    schema_str = n["metaData"]["schemaString"]
                    part_cols = list(
                        n["metaData"].get("partitionColumns") or [])
                if "add" in n:
                    a = n["add"]
                    dv = a.get("deletionVector") or {}
                    live[a["path"]] = {
                        "pv": a.get("partitionValues") or {},
                        "dv": dv.get("pathOrInlineDv"),
                    }
                if "remove" in n:
                    live.pop(n["remove"]["path"], None)
    if schema_str is None:
        fail("delta log has no metaData")
    return schema_str, part_cols, live


def read_delta(table):
    import pandas as pd
    schema_str, part_cols, live = replay_delta(table)
    types = spark_schema_types(schema_str)
    # Column mapping (name mode): parquet files spell each field's
    # PHYSICAL name (field metadata delta.columnMapping.physicalName);
    # the logical name is just the label. Identity when mapping is off.
    fields = json.loads(schema_str)["fields"]
    to_logical = {}
    for f in fields:
        p = (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"])
        if p != f["name"]:
            to_logical[p] = f["name"]
    frames = []
    for path, info in sorted(live.items()):
        tb = pq.read_table(os.path.join(table, path))
        if info["dv"]:
            dv_doc = json.load(open(os.path.join(table, info["dv"])))
            dead = set(dv_doc["deletedRows"])
            mask = pa.array(i not in dead for i in range(tb.num_rows))
            tb = tb.filter(mask)
        df = tb.to_pandas()
        if to_logical:
            df = df.rename(columns=to_logical)
        for pc in part_cols:
            df[pc] = typed_part_value(info["pv"].get(pc), types.get(pc))
        frames.append(df)
    cols = [f["name"] for f in fields]
    out = pd.concat(frames, ignore_index=True)
    for c in cols:  # columns added after a file was written read null
        if c not in out.columns:
            out[c] = None
    return out[cols]


# -------------------------------------------------------------- Iceberg

def field_id_map(path):
    """parquet column name -> field_id, from the file's own footer."""
    out = {}
    for f in pq.read_schema(path):
        fid = (f.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            out[int(fid)] = f.name
    return out


def read_iceberg(table, ref=None):
    import pandas as pd
    hint = os.path.join(table, "metadata", "version-hint.text")
    v = int(open(hint).read().strip())
    meta = json.load(open(os.path.join(table, "metadata",
                                       f"v{v}.metadata.json")))
    assert meta["format-version"] == 2
    schemas = {s["schema-id"]: s for s in meta["schemas"]}
    cur = schemas[meta["current-schema-id"]]
    if ref is None:
        snap = meta["current-snapshot-id"]
    else:
        # Ref resolution per the spec's `refs` map: name -> snapshot-id.
        r = meta.get("refs", {}).get(ref)
        if r is None:
            fail(f"no ref {ref} in {table}")
        snap = r["snapshot-id"]
    list_rel = {s["snapshot-id"]: s["manifest-list"]
                for s in meta["snapshots"]}[snap]
    manifests = json.load(open(os.path.join(table, list_rel)))["manifests"]
    data_files, delete_files, eq_dels = [], [], []
    for mrel in manifests:
        m = json.load(open(os.path.join(table, mrel)))
        if m.get("content", "data") == "deletes":
            if m.get("equality-ids"):
                eq_dels.append((m["equality-ids"],
                                m.get("sequence-number", 0),
                                m.get("schema-id",
                                      meta["current-schema-id"]),
                                [e["path"] for e in m["entries"]]))
            else:
                delete_files += [e["path"] for e in m["entries"]]
        else:
            data_files += [(e["path"], m["schema-id"],
                            e.get("partitionValues") or {},
                            m.get("sequence-number", 0))
                           for e in m["entries"]]
    dead = set()
    for dp in delete_files:
        t = pq.read_table(os.path.join(table, dp))
        for fp, pos in zip(t.column("file_path").to_pylist(),
                           t.column("pos").to_pylist()):
            dead.add((fp, pos))
    # Equality deletes: key rows resolved to CURRENT column names by
    # field id (the delete file is written under its manifest's schema),
    # applied below only to data files with a STRICTLY SMALLER sequence
    # number — the Iceberg v2 scoping that lets re-inserted keys live.
    eq_groups = []
    for ids, dseq, dsid, paths in eq_dels:
        wnames = {f["id"]: f["name"]
                  for f in schemas.get(dsid, cur)["fields"]}
        curnames = {f["id"]: f["name"] for f in cur["fields"]}
        keys = set()
        for p in paths:
            t = pq.read_table(os.path.join(table, p))
            cols = [t.column(wnames[i]).to_pylist() for i in ids]
            keys |= set(zip(*cols))
        eq_groups.append(([curnames[i] for i in ids], dseq, keys))
    print(f"  iceberg: metadata v{v}, snapshot {snap}, "
          f"{len(data_files)} data files, {len(dead)} deleted positions, "
          f"{len(eq_groups)} equality-delete groups")
    def typed_pv(fd, v):
        """Partition value string -> the field's declared type."""
        if v is None:
            return None
        t = json.loads(fd["spark-type"])
        if t in ("long", "integer", "short", "byte"):
            return int(v)
        if t in ("double", "float"):
            return float(v)
        return v

    frames = []
    missing_fid = 0
    for path, sid, pv, fseq in data_files:
        full = os.path.join(table, path)
        fids = field_id_map(full)
        foreign = os.path.isabs(path)
        if not fids and not foreign:
            missing_fid += 1
        tb = pq.read_table(full)
        fname = os.path.basename(path)
        if dead:
            mask = pa.array((fname, i) not in dead
                            for i in range(tb.num_rows))
            tb = tb.filter(mask)
        df = tb.to_pandas()
        # Resolve to the CURRENT schema by field id (renames re-label,
        # added columns materialize as null) — the Iceberg contract.
        # Partition columns are NOT in the data files: their values are
        # injected from the manifest entry's partitionValues (keyed by
        # the column's write-time name under the entry's schema), which
        # is how evolved-spec layouts stay readable. Converted tables
        # (absolute-path references to files another writer produced)
        # carry no field ids; those resolve by NAME, which is sound
        # exactly because conversion pins a single un-evolved schema.
        wnames = {f["id"]: f["name"]
                  for f in schemas.get(sid, cur)["fields"]}
        out = {}
        for fd in cur["fields"]:
            src = fd["name"] if (foreign and not fids) \
                else fids.get(fd["id"])
            wname = wnames.get(fd["id"], fd["name"])
            if src in df.columns:
                out[fd["name"]] = df[src]
            elif wname in pv:
                out[fd["name"]] = pd.Series(
                    [typed_pv(fd, pv[wname])] * len(df))
            else:
                out[fd["name"]] = None
        pdf = pd.DataFrame(out)
        for names, dseq, keys in eq_groups:
            if fseq < dseq and len(pdf):
                tuples = list(zip(*[pdf[n] for n in names]))
                pdf = pdf[[t not in keys for t in tuples]]
        frames.append(pdf)
    if missing_fid:
        fail(f"{missing_fid} native data files carry no parquet field_ids")
    return pd.concat(frames, ignore_index=True)


def check(name, got_df, expected_dir):
    import pandas as pd
    exp_files = glob.glob(os.path.join(expected_dir, "*.parquet"))
    exp = pd.concat([pq.read_table(f).to_pandas() for f in exp_files],
                    ignore_index=True)
    got, want = norm_rows(got_df), norm_rows(exp)
    if len(got) != len(want):
        fail(f"{name}: rows {len(got)} vs expected {len(want)}")
    if got != want:
        diffs = [(a, b) for a, b in zip(got, want) if a != b]
        fail(f"{name}: {len(diffs)} differing rows; first: "
             f"py={diffs[0][0]} graft={diffs[0][1]}")
    print(f"PASS {name} ({len(got)} rows, independent replay matches)")


def main(root):
    read = read_delta(os.path.join(root, "delta_table"))
    check("delta", read, os.path.join(root, "delta_expected"))
    # Shallow clone: add paths are ABSOLUTE (into the source table);
    # os.path.join drops the clone root for them, per POSIX — exactly
    # the resolution the protocol intends.
    read = read_delta(os.path.join(root, "delta_clone"))
    check("delta_clone", read, os.path.join(root, "delta_clone_expected"))
    # Column mapping: renamed logical names resolve through each
    # field's physicalName metadata; post-rename appends + DVs ride.
    p = os.path.join(root, "delta_cm")
    if os.path.isdir(p):
        read = read_delta(p)
        check("delta_cm", read, os.path.join(root, "delta_cm_expected"))
    read = read_iceberg(os.path.join(root, "iceberg_table"))
    check("iceberg", read, os.path.join(root, "iceberg_expected"))
    # Equality deletes: two key sets + a position delete coexisting,
    # scoped by data sequence numbers.
    p = os.path.join(root, "iceberg_eqdel")
    if os.path.isdir(p):
        read = read_iceberg(p)
        check("iceberg_eqdel", read,
              os.path.join(root, "iceberg_eqdel_expected"))
    # Partition-spec evolution + sort order: pre-evolution loose files
    # and post-evolution data/k=v/ files coexist; the evolved-spec
    # files' partition column is injected from manifest entries.
    p = os.path.join(root, "iceberg_evolved")
    if os.path.isdir(p):
        read = read_iceberg(p)
        check("iceberg_evolved", read,
              os.path.join(root, "iceberg_evolved_expected"))
    # Converted tables (LakeConvert): an Iceberg metadata tree over
    # id-less Delta-written parquet, and a Delta log over Iceberg-
    # written parquet — both referenced by absolute path, zero copy.
    read = read_iceberg(os.path.join(root, "conv_iceberg"))
    check("conv_iceberg", read, os.path.join(root, "conv_iceberg_expected"))
    read = read_delta(os.path.join(root, "conv_delta"))
    check("conv_delta", read, os.path.join(root, "conv_delta_expected"))
    # Refs: the plain read stays on current-snapshot-id while the
    # branch resolves through the metadata `refs` map; the tag must be
    # recorded immutable ("tag") and pin the first snapshot.
    p = os.path.join(root, "iceberg_refs")
    if os.path.isdir(p):
        read = read_iceberg(p)
        check("iceberg_refs_main", read,
              os.path.join(root, "iceberg_refs_main_expected"))
        read = read_iceberg(p, ref="dev")
        check("iceberg_refs_dev", read,
              os.path.join(root, "iceberg_refs_dev_expected"))
        hint = os.path.join(p, "metadata", "version-hint.text")
        v = int(open(hint).read().strip())
        meta = json.load(open(os.path.join(p, "metadata",
                                           f"v{v}.metadata.json")))
        refs = meta.get("refs", {})
        if refs.get("v1", {}).get("type") != "tag":
            fail("iceberg_refs: v1 not recorded as a tag")
        if refs["v1"]["snapshot-id"] != 1:
            fail("iceberg_refs: tag v1 must pin snapshot 1")
        print("PASS iceberg_refs metadata (tag pinned, branch ahead)")
    # Generated columns: the partition column reconstructs from
    # add-action partitionValues alone (it is in no data file), and the
    # generation rule is visible in the schemaString field metadata.
    p = os.path.join(root, "delta_gen")
    if os.path.isdir(p):
        read = read_delta(p)
        check("delta_gen", read, os.path.join(root, "delta_gen_expected"))
        schema_str, _, _ = replay_delta(p)
        fields = json.loads(schema_str)["fields"]
        gen = [f for f in fields
               if "delta.generationExpression" in (f.get("metadata") or {})]
        if not gen or gen[0]["name"] != "o_month":
            fail("delta_gen: generationExpression metadata missing")
        print("PASS delta_gen metadata (generationExpression recorded)")
    print("\nOK: both table formats (clones, conversions, refs and "
          "generated columns included) reconstruct identically from "
          "their on-disk protocol alone")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/interop")
