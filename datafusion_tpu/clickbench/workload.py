"""hits-like data generator + ClickBench query subset."""
from __future__ import annotations

from typing import Dict

import numpy as np


def generate_hits(n: int = 100_000, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    n_users = max(n // 20, 10)
    # zipf-ish skew for user activity and search phrases (the workload's
    # defining property: heavy hitters in high-cardinality group-bys)
    user = (rng.zipf(1.3, n) % n_users).astype(np.int64)
    phrases = np.array(
        [""] * 1 + [f"search phrase {i}" for i in range(997)], dtype=object)
    phrase_idx = np.where(rng.random(n) < 0.6, 0,
                          rng.zipf(1.5, n) % len(phrases))
    urls = np.array([f"http://example.com/page{i}" for i in range(5000)],
                    dtype=object)
    titles = np.array([f"Title {i}" for i in range(3000)], dtype=object)
    t0 = 1372636800  # 2013-07-01, the canonical hits window
    return {
        "WatchID": rng.integers(0, 2**62, n),
        "CounterID": rng.integers(0, 6000, n).astype(np.int64),
        "UserID": user,
        "RegionID": rng.integers(0, 5000, n).astype(np.int64),
        "AdvEngineID": np.where(rng.random(n) < 0.95, 0,
                                rng.integers(1, 20, n)).astype(np.int64),
        "SearchEngineID": rng.integers(0, 5, n).astype(np.int64),
        "SearchPhrase": phrases[phrase_idx],
        "URL": urls[rng.zipf(1.4, n) % len(urls)],
        "Title": titles[rng.integers(0, len(titles), n)],
        "EventTime": (t0 + rng.integers(0, 7 * 86400, n)).astype(np.int64),
        "EventDate": ((t0 + rng.integers(0, 7 * 86400, n)) // 86400
                      ).astype("datetime64[D]"),
        "ResolutionWidth": rng.choice(
            [1024, 1280, 1366, 1440, 1536, 1600, 1920, 2560], n).astype(np.int64),
        "MobilePhoneModel": np.where(
            rng.random(n) < 0.8, "",
            rng.choice(np.array([f"Phone{i}" for i in range(50)],
                                dtype=object), n)).astype(object),
        "MobilePhone": rng.integers(0, 10, n).astype(np.int64),
        "IsRefresh": (rng.random(n) < 0.05).astype(np.int64),
        "DontCountHits": (rng.random(n) < 0.02).astype(np.int64),
        "Referer": np.where(rng.random(n) < 0.3, "",
                            urls[rng.integers(0, len(urls), n)]).astype(object),
        "ClientIP": rng.integers(0, 2**31, n),
        "Duration": rng.integers(0, 5000, n).astype(np.int64),
    }


def register_hits(ctx, n: int = 100_000, seed: int = 0) -> None:
    from ..datasource.memory import MemTable
    ctx.register_table("hits", MemTable.from_arrays(generate_hits(n, seed)))


# The public ClickBench statements covering the generated columns
# (numbering follows benchmarks/queries/clickbench/queries.sql).
QUERIES = {
    0: "SELECT COUNT(*) FROM hits",
    1: "SELECT COUNT(*) FROM hits WHERE \"AdvEngineID\" <> 0",
    2: "SELECT SUM(\"AdvEngineID\"), COUNT(*), AVG(\"ResolutionWidth\") FROM hits",
    4: "SELECT COUNT(DISTINCT \"UserID\") FROM hits",
    5: "SELECT COUNT(DISTINCT \"SearchPhrase\") FROM hits",
    7: "SELECT \"AdvEngineID\", COUNT(*) FROM hits WHERE \"AdvEngineID\" <> 0 "
       "GROUP BY \"AdvEngineID\" ORDER BY COUNT(*) DESC",
    8: "SELECT \"RegionID\", COUNT(DISTINCT \"UserID\") AS u FROM hits "
       "GROUP BY \"RegionID\" ORDER BY u DESC LIMIT 10",
    9: "SELECT \"RegionID\", SUM(\"AdvEngineID\"), COUNT(*) AS c, "
       "AVG(\"ResolutionWidth\"), COUNT(DISTINCT \"UserID\") FROM hits "
       "GROUP BY \"RegionID\" ORDER BY c DESC LIMIT 10",
    10: "SELECT \"MobilePhoneModel\", COUNT(DISTINCT \"UserID\") AS u FROM hits "
        "WHERE \"MobilePhoneModel\" <> '' GROUP BY \"MobilePhoneModel\" "
        "ORDER BY u DESC LIMIT 10",
    12: "SELECT \"SearchPhrase\", COUNT(*) AS c FROM hits "
        "WHERE \"SearchPhrase\" <> '' GROUP BY \"SearchPhrase\" "
        "ORDER BY c DESC LIMIT 10",
    13: "SELECT \"SearchPhrase\", COUNT(DISTINCT \"UserID\") AS u FROM hits "
        "WHERE \"SearchPhrase\" <> '' GROUP BY \"SearchPhrase\" "
        "ORDER BY u DESC LIMIT 10",
    15: "SELECT \"UserID\", COUNT(*) FROM hits GROUP BY \"UserID\" "
        "ORDER BY COUNT(*) DESC LIMIT 10",
    16: "SELECT \"UserID\", \"SearchPhrase\", COUNT(*) FROM hits "
        "GROUP BY \"UserID\", \"SearchPhrase\" ORDER BY COUNT(*) DESC LIMIT 10",
    18: "SELECT \"UserID\", extract(minute FROM to_timestamp(\"EventTime\")) AS m, "
        "\"SearchPhrase\", COUNT(*) FROM hits "
        "GROUP BY \"UserID\", m, \"SearchPhrase\" ORDER BY COUNT(*) DESC LIMIT 10",
    19: "SELECT \"UserID\" FROM hits WHERE \"UserID\" = 435090932899640449",
    20: "SELECT COUNT(*) FROM hits WHERE \"URL\" LIKE '%page42%'",
    21: "SELECT \"SearchPhrase\", MIN(\"URL\"), COUNT(*) AS c FROM hits "
        "WHERE \"URL\" LIKE '%page1%' AND \"SearchPhrase\" <> '' "
        "GROUP BY \"SearchPhrase\" ORDER BY c DESC LIMIT 10",
    25: "SELECT \"SearchPhrase\" FROM hits WHERE \"SearchPhrase\" <> '' "
        "ORDER BY \"EventTime\" LIMIT 10",
    26: "SELECT \"SearchPhrase\" FROM hits WHERE \"SearchPhrase\" <> '' "
        "ORDER BY \"SearchPhrase\" LIMIT 10",
    27: "SELECT \"SearchPhrase\" FROM hits WHERE \"SearchPhrase\" <> '' "
        "ORDER BY \"EventTime\", \"SearchPhrase\" LIMIT 10",
    32: "SELECT \"WatchID\", \"ClientIP\", COUNT(*) AS c, SUM(\"IsRefresh\"), "
        "AVG(\"ResolutionWidth\") FROM hits GROUP BY \"WatchID\", \"ClientIP\" "
        "ORDER BY c DESC LIMIT 10",
    37: "SELECT \"Title\", COUNT(*) AS PageViews FROM hits "
        "WHERE \"DontCountHits\" = 0 AND \"IsRefresh\" = 0 AND \"Title\" <> '' "
        "GROUP BY \"Title\" ORDER BY PageViews DESC LIMIT 10",
    39: "SELECT \"URL\", COUNT(*) AS PageViews FROM hits "
        "WHERE \"IsRefresh\" = 0 AND \"AdvEngineID\" <> 0 "
        "GROUP BY \"URL\" ORDER BY PageViews DESC LIMIT 10",
}
