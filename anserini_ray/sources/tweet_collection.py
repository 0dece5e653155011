"""Tweet collection parser — reference `TweetCollection.java` +
`TweetGenerator.java:108-146`:

- JSONL of tweet objects; records with a "delete" key are skipped
  (`TweetCollection.java:103`);
- retweets skipped (retweeted_status present), ids above max_id skipped;
- contents = trim(text) minus its LAST character (faithfully reproducing the
  reference's inclusive-end `validTextRange` passed to the exclusive-end
  `substring` — a quirk visible in its own golden fixtures:
  "test adding more tweets" -> "test adding more tweet"), then URLs removed
  and trimmed;
- the tweet id doubles as the `ts` value so the engine's ts_range filter
  implements the Microblog `querytweettime` constraint
  (`SearchCollection.java:575-582`).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA

_URL = re.compile(r"https?://\S+")


def tweet_contents(text: str) -> str:
    t = text.strip()
    if t:
        t = t[:-1]  # reference inclusive-end validTextRange quirk
    t = _URL.sub("", t)
    return t.strip()


def parse_tweets(lines, max_id: int | None = None) -> list[tuple[str, int, str]]:
    """-> [(id_str, id_long, contents)] after delete/retweet/max_id/empty
    filters."""
    out = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "delete" in obj:
            continue
        if "retweeted_status" in obj and obj["retweeted_status"]:
            continue
        tid = int(obj.get("id", -1))
        if max_id is not None and tid > max_id:
            continue
        contents = tweet_contents(obj.get("text", "") or "")
        if not contents:
            continue
        out.append((str(obj.get("id_str", tid)), tid, contents))
    return out


def read_tweet_collection(path: str, max_id: int | None = None):
    import os

    import ray.data

    files = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files.extend(os.path.join(root, x) for x in sorted(names))
    else:
        files = [path]

    def parse_one(row) -> list[dict]:
        with open(row["path"], errors="replace") as f:
            return [
                {"conv_id": i, "tid": t, "text": c}
                for i, t, c in parse_tweets(f, max_id)
            ]

    ds = ray.data.from_items([{"path": f} for f in files]).flat_map(parse_one)

    def to_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch["conv_id"],
                pa.array(np.zeros(n, dtype=np.int32)),
                pa.array(["tweet"] * n),
                batch["text"],
                pa.array([""] * n),
                batch["tid"].cast(pa.timestamp("us")),  # id as ts for filters
            ],
            schema=TRANSCRIPT_SCHEMA,
        )

    return ds.map_batches(to_rows, batch_format="pyarrow")
