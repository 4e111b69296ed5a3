"""Single-process reference simulator (SURVEY §5.2.2, §7.1 step 7).

Reimplements the *reference's* crawl-loop semantics — sequential per-host
fetch order, politeness clocks, seen-set membership, retry/backoff — as a
plain Python loop over lists of dicts (the reference's own IR: see
``Glassdoor_url_finder.py:258-366`` / ``Glassdoor_Scraper_New.py:830-908``
for the loop shape being modeled). It shares the exact kernel *function
objects* with the engine (canonicalize_url, extract_fields, parse_robots,
round_clock, backoff constants), so any engine/oracle divergence is a real
engine bug, never kernel drift.

The parity contract (BASELINE.json north_star): identical per-host crawl
ordering, identical URL-seen membership, byte-identical extracted text
per url.
"""

from __future__ import annotations

from webscraper_spark.functions.canon import canonicalize_url, host_of, url_hash_py
from webscraper_spark.functions.extract import extract_fields
from webscraper_spark.functions.robots import parse_robots, robots_allows
from webscraper_spark.operators.schedule import DEFAULT_DELAY_MS
from webscraper_spark.plans.round import RETRY_BACKOFF, round_clock

from datetime import timedelta


def simulate_crawl(
    pages_rows,
    seeds_rows,
    hosts_rows,
    n_rounds: int,
    per_host_budget: int = 5,
    max_retries: int = 2,
):
    """Run the reference-semantics crawl; returns golden artifacts."""
    # newest-wins page index by canonical url (C10)
    pages: dict[str, dict] = {}
    for r in pages_rows:
        cu = canonicalize_url(r["url"])
        if cu is None:
            continue
        prev = pages.get(cu)
        if prev is None or r["warc_ts"] > prev["warc_ts"]:
            pages[cu] = r

    hosts: dict[str, dict] = {}
    for h in hosts_rows:
        rules = parse_robots(h.get("robots_txt"))
        delay = rules["crawl_delay_ms"] or h.get("crawl_delay_ms") or DEFAULT_DELAY_MS
        hosts[h["host"]] = {
            "rules": rules,
            "delay_ms": int(delay),
            "clock": h["next_allowed_ts"],
        }

    frontier: dict[int, dict] = {}
    seen: set[int] = set()
    for s in seeds_rows:
        cu = canonicalize_url(s["url"])
        if cu is None:
            continue
        uh = url_hash_py(cu)
        if uh in frontier:
            continue
        frontier[uh] = {
            "url": cu,
            "host": host_of(cu),
            "priority": int(s["priority"]),
            "retry_count": 0,
            "next_fetch_ts": None,
        }
        seen.add(uh)

    orders = []  # (round, host, host_seq, url, scheduled_ts)
    texts = {}  # url -> extracted text (last fetch wins; urls fetch once)
    lineages = []

    for rnd in range(1, n_rounds + 1):
        start = round_clock(rnd)
        # admission: backoff gate + robots
        eligible = []
        for uh, f in frontier.items():
            if f["next_fetch_ts"] is not None and f["next_fetch_ts"] > start:
                continue
            hinfo = hosts.get(f["host"])
            # path sans query — same as parse_url(url, 'PATH') engine-side
            path = "/" + f["url"].split("://", 1)[1].partition("/")[2].partition("?")[0]
            if hinfo is not None and not robots_allows(hinfo["rules"], path):
                continue
            eligible.append((uh, f))

        # per-host ordering: (priority, url_hash) — the politeness queue
        by_host: dict[str, list] = {}
        for uh, f in eligible:
            by_host.setdefault(f["host"], []).append((f["priority"], uh, f))
        scheduled = []
        for host, items in by_host.items():
            items.sort(key=lambda t: (t[0], t[1]))
            hinfo = hosts.get(host)
            delay = hinfo["delay_ms"] if hinfo else DEFAULT_DELAY_MS
            # clock clamped to the round floor: a host idle for rounds has
            # a stale clock, and fetches can't be scheduled before the
            # round starts (same rule as the streaming scheduler)
            clock = hinfo["clock"] if hinfo else start
            clock = max(clock, start) if clock is not None else start
            for seq, (_, uh, f) in enumerate(items[:per_host_budget], start=1):
                sched_ts = clock + timedelta(milliseconds=(seq - 1) * delay)
                scheduled.append((host, seq, uh, f, sched_ts))
            n = min(len(items), per_host_budget)
            if hinfo is not None and n:
                hinfo["clock"] = clock + timedelta(milliseconds=n * delay)

        # fetch + extract + discover
        candidates: dict[str, int] = {}
        n_hits = n_miss = 0
        for host, seq, uh, f, sched_ts in scheduled:
            orders.append((rnd, host, seq, f["url"], sched_ts))
            page = pages.get(f["url"])
            if page is None:
                n_miss += 1
                f["retry_count"] += 1
                if f["retry_count"] > max_retries:
                    del frontier[uh]
                else:
                    f["next_fetch_ts"] = start + RETRY_BACKOFF
                continue
            n_hits += 1
            fields = extract_fields(page["html"])
            texts[f["url"]] = fields["text"]
            for href in fields["outlinks"] or []:
                cu = canonicalize_url(href, base=f["url"])
                if cu is None:
                    continue
                p = candidates.get(cu)
                if p is None or f["priority"] < p:
                    candidates[cu] = f["priority"]
            del frontier[uh]

        n_new = 0
        for cu, pprio in candidates.items():
            uh = url_hash_py(cu)
            if uh in seen:
                continue
            seen.add(uh)
            n_new += 1
            frontier[uh] = {
                "url": cu,
                "host": host_of(cu),
                "priority": pprio + 1,
                "retry_count": 0,
                "next_fetch_ts": None,
            }
        lineages.append(
            {"scheduled": len(scheduled), "fetched": n_hits, "missed": n_miss, "new_urls": n_new}
        )

    return {
        "seen": seen,
        "orders": orders,
        "texts": texts,
        "frontier": frontier,
        "lineages": lineages,
        "host_clocks": {h: v["clock"] for h, v in hosts.items()},
    }
