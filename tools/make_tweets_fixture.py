#!/usr/bin/env python
"""Deterministic tweets-shaped fixture generator (FIXTURES.md §B).

Synthesizes ~2,000 tweets over ~150 users mirroring the fields the reference
reads from ``tweets.json`` (``/root/reference/COMP5349_2.py:138,146,196``):

- ``replyto_id``/``retweet_id`` drawn from a skewed pool of ~300 target
  tweets so users share vocabulary → non-degenerate TF-IDF/CV cosines with
  ties (needed to pin the score-DESC, id-DESC tie-break of nb:220-230).
- mention graph Zipf-skewed so ALS(seed=0) yields stable top-5 lists.
- ~2% null ``user_id`` (exercises W2's P2 filter and W1's null-author doc).
- never reply AND retweet on the same row (invariant, COMP5349_2.py:143);
  ~30% of rows are neither (dropped by the P1 filter).
- a designated query user (analog of test_id=202170318) with >=10
  interactions: QUERY_USER below.
- 32-bit murmur collision behavior of the reference (O7 hazard) is
  intentionally NOT replicated — IDs here are small and collision-free
  either way; the engine uses a dense dictionary regardless.

Pure-stdlib and seeded: running it twice produces byte-identical output.
Writes JSONL (scale path) and a multiline JSON array (reference-fidelity
path) next to the goldens in tests/fixtures/.
"""

from __future__ import annotations

import json
import os
import random

SEED = 7
N_TWEETS = 2000
N_USERS = 150
N_TARGETS = 300  # interaction-id pool
BASE_TWEET_ID = 1_000_000_000_000
BASE_USER_ID = 20_000_000
QUERY_USER = BASE_USER_ID + 1  # designated analog of test_id

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures")

WORDS = ("spark catalyst shuffle broadcast window partition codegen arrow "
         "parquet stream state watermark join agg scan sink").split()


def zipf_choice(rng: random.Random, n: int) -> int:
    """1-based Zipf-ish index in [0, n): P(i) ∝ 1/(i+1)."""
    weights = [1.0 / (i + 1) for i in range(n)]
    return rng.choices(range(n), weights=weights, k=1)[0]


def main() -> None:
    rng = random.Random(SEED)
    users = [BASE_USER_ID + i for i in range(N_USERS)]
    targets = [BASE_TWEET_ID + 500_000 + i for i in range(N_TARGETS)]

    rows = []
    for i in range(N_TWEETS):
        tweet_id = BASE_TWEET_ID + i
        # ~2% null authors; the query user authors every 40th tweet so it
        # accumulates >=10 interactions.
        if i % 40 == 1:
            user_id = QUERY_USER
        elif rng.random() < 0.02:
            user_id = None
        else:
            user_id = users[zipf_choice(rng, N_USERS)]

        kind = rng.random()
        replyto_id = retweet_id = None
        if kind < 0.35:
            replyto_id = targets[zipf_choice(rng, N_TARGETS)]
        elif kind < 0.70:
            retweet_id = targets[zipf_choice(rng, N_TARGETS)]
        # else: neither (organic tweet, dropped by P1)

        n_mentions = rng.choices([None, 0, 1, 2, 3, 4], weights=[8, 12, 40, 25, 10, 5])[0]
        if n_mentions is None:
            user_mentions = None
        else:
            user_mentions = [
                {"id": users[zipf_choice(rng, N_USERS)], "indices": [3 * j, 3 * j + 2]}
                for j in range(n_mentions)
            ]

        text = " ".join(rng.choices(WORDS, k=rng.randint(3, 12)))
        rows.append(
            {
                "id": tweet_id,
                "user_id": user_id,
                "replyto_id": replyto_id,
                "retweet_id": retweet_id,
                "text": text,
                "user_mentions": user_mentions,
            }
        )

    os.makedirs(OUT_DIR, exist_ok=True)
    jsonl = os.path.join(OUT_DIR, "tweets.jsonl")
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    multiline = os.path.join(OUT_DIR, "tweets.json")
    with open(multiline, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    print(f"wrote {len(rows)} tweets to {jsonl} and {multiline}")
    print(f"query user: {QUERY_USER}")


if __name__ == "__main__":
    main()
