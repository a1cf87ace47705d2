"""Exactly-once micro-batch commit for the foreachBatch ingest loops.

The staged-append discipline the BM25 index maintainer proved out
(``pipelines/retrieval.bm25_append_index`` + ``bm25_index_stream``,
ADVICE r12/r13), factored so every stateful ingest loop shares ONE
implementation instead of one honest at-least-once caveat each:

- the batch's outputs are all written under ``{root}/_append_pending/...``
  first; none of the live tables is touched until staging completes;
- the stream's applied-marker is staged INSIDE the pending dir (under
  ``_markers/``) BEFORE the ``_STAGED_OK`` flag lands, so a stage is never
  "complete" without its ownership record — publish then lands data and
  marker together (the FUSED commit point: there is no crash window between
  publish and marker write through which a redelivery could re-append);
- publish is a short sequence of file moves, each tolerant of the thing it
  moves being already gone, so it is idempotent-resumable after ANY crash;
- a completed stage that does NOT carry the current batch's marker is a
  foreign writer's crashed publish — publishing it and marking the batch
  applied would silently drop the batch's own data, so the loop fails
  loudly and directs the operator to :func:`publish_pending_batch`.

``root`` is the loop's stateful store (its index path): the pending dir,
the markers, and the txn metadata all live under it, and Spark/Hadoop
listing ignores underscore-prefixed children, so readers of the index
never see the machinery.

Single-writer contract (shared with every rewrite op in the package):
one maintainer per ``root`` at a time — the stream IS that writer while
it runs.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

PENDING = "_append_pending"
STAGED_OK = "_STAGED_OK"
MARKERS = "_markers"
APPLIED = "_stream_applied"
TARGETS = "_targets"


def _read_targets(pend: str) -> list[tuple[str, str]]:
    out = []
    with open(os.path.join(pend, TARGETS)) as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                sub, tgt = line.split("\t", 1)
                out.append((sub, tgt))
    return out


def publish_pending_batch(root: str) -> None:
    """Publish a fully-staged micro-batch at ``{root}/_append_pending``:
    move every staged parquet part-file into its live target directory
    (recorded in the stage's ``_targets`` manifest; Spark part-file names
    carry task UUIDs, so moves never collide), land the staged
    applied-markers into ``{root}/_stream_applied``, then drop the
    pending dir. Every step tolerates its object being already
    moved/created, so after ANY crash mid-publish calling this again
    completes the batch exactly once — data and marker together."""
    pend = os.path.join(root, PENDING)
    if not os.path.exists(os.path.join(pend, STAGED_OK)):
        raise RuntimeError(
            f"publish_pending_batch: no completed stage at {pend}; nothing "
            "to publish (an un-marked pending dir is an aborted stage — "
            "re-run the ingest, which discards and restages it)."
        )
    for sub, tgt in _read_targets(pend):
        staged = os.path.join(pend, sub)
        if not os.path.isdir(staged):
            continue  # already moved by a previous (crashed) publish
        os.makedirs(tgt, exist_ok=True)
        for fname in sorted(os.listdir(staged)):
            if fname.endswith(".parquet"):
                shutil.move(os.path.join(staged, fname), os.path.join(tgt, fname))
        shutil.rmtree(staged)
    markers = os.path.join(pend, MARKERS)
    if os.path.isdir(markers):
        applied = os.path.join(root, APPLIED)
        os.makedirs(applied, exist_ok=True)
        for fname in sorted(os.listdir(markers)):
            open(os.path.join(applied, fname), "w").close()
    shutil.rmtree(pend)


def staged_batch_publish(
    root: str,
    targets: "dict[str, str]",
    stage: "Callable[[str], None]",
    name_hint: str,
) -> None:
    """Batch-side staged commit — the marker-less sibling of
    :func:`exactly_once_apply` for OFFLINE multi-table appends (e.g. the
    minhash index's sigs+bands pair): a crash between two live-table
    appends must not leave the pair inconsistent, so both stage under
    ``{root}/_append_pending`` and publish together. A completed stage
    found on disk is a previous caller's crashed publish: this function
    refuses (re-staging would double-append the published part) and
    directs to :func:`publish_pending_batch`; an un-marked half-stage is
    discarded and restaged."""
    pend = os.path.join(root, PENDING)
    if os.path.exists(os.path.join(pend, STAGED_OK)):
        raise RuntimeError(
            f"{name_hint}: found a fully-staged pending append at {pend} — "
            "a previous append crashed DURING publish. Run "
            "laradb_spark.streaming.txn.publish_pending_batch(root) to "
            "finish it; re-running the append would double-count the "
            "published part."
        )
    if os.path.isdir(pend):
        shutil.rmtree(pend)  # aborted half-stage: nothing was published
    stage(pend)
    os.makedirs(pend, exist_ok=True)
    with open(os.path.join(pend, TARGETS), "w") as f:
        for sub, tgt in sorted(targets.items()):
            f.write(f"{sub}\t{os.path.abspath(tgt)}\n")
    open(os.path.join(pend, STAGED_OK), "w").close()
    publish_pending_batch(root)


def exactly_once_apply(
    root: str,
    batch_id: int,
    name_hint: str,
    stage: "Callable[[str], None]",
    targets: "dict[str, str]",
) -> None:
    """The shared exactly-once ``foreachBatch`` skeleton. Call from inside
    a loop's ``_apply(batch_df, batch_id)``:

    - this batch's applied-marker already present → no-op (redelivery of
      a fully-committed batch);
    - a completed stage CARRYING this batch's marker → finish its publish
      (crash-during-publish recovery — never re-stage, the staged data IS
      this batch's);
    - a completed stage WITHOUT this batch's marker → raise (foreign
      writer's crashed publish; see module docstring);
    - otherwise: discard any half-stage (nothing was published, so a
      re-run recomputes the identical decision against the unchanged
      index), call ``stage(pend)`` — which must write each output as
      parquet under ``{pend}/<key>`` for every key in ``targets`` — then
      land the manifest + marker + ``_STAGED_OK`` and publish.

    ``targets`` maps each staged subdirectory to its live directory. The
    stage callback's reads of the live index are safe by construction:
    staging never mutates live tables, so a crash anywhere inside
    ``stage`` leaves the loop re-runnable."""
    name = f"batch_{int(batch_id)}"
    if os.path.exists(os.path.join(root, APPLIED, name)):
        return
    pend = os.path.join(root, PENDING)
    ok = os.path.join(pend, STAGED_OK)
    if os.path.exists(ok):
        if not os.path.exists(os.path.join(pend, MARKERS, name)):
            raise RuntimeError(
                f"{name_hint}: found a completed pending stage at {pend} "
                f"that does NOT belong to this micro-batch ({name}) — a "
                "foreign writer crashed mid-publish before this stream ran. "
                "Publishing it here would mark this batch applied without "
                "ingesting its data. Run "
                "laradb_spark.streaming.txn.publish_pending_batch(root) "
                "first, then restart the stream."
            )
        publish_pending_batch(root)
        return
    if os.path.isdir(pend):
        # aborted half-stage: nothing was published, the live tables never
        # saw it — discard and restage
        shutil.rmtree(pend)
    stage(pend)
    os.makedirs(pend, exist_ok=True)
    with open(os.path.join(pend, TARGETS), "w") as f:
        for sub, tgt in sorted(targets.items()):
            f.write(f"{sub}\t{os.path.abspath(tgt)}\n")
    os.makedirs(os.path.join(pend, MARKERS), exist_ok=True)
    open(os.path.join(pend, MARKERS, name), "w").close()
    open(ok, "w").close()
    publish_pending_batch(root)
