"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1–3).

Everything derives from a seeded numpy Generator and a logical clock
(base epoch 2025-07-25T00:00:00Z) — no wall-clock, so two generations are
byte-identical (SURVEY §7.4 determinism requirement).

Shape highlights:
- hosts drawn from a power-law (Zipf s≈1.2) so a few hot hosts exercise
  skew/salting in the scheduler;
- ~10% of urls carry canonicalization noise (uppercase host, #fragment,
  default port, shuffled query params);
- outlinks point at other rows' urls (closure ⇒ multi-round crawl stays
  inside the table) plus malformed/off-scope hrefs for admission filtering;
- ~2% duplicate urls with later ``warc_ts`` (newest-wins dedup, C10);
- a slice of pages embeds the reference's extraction targets (rating spans
  matching ``^\\d+\\.\\d+$``, ``(N total reviews)``, ``Engaged Employer``)
  to exercise the fallback-ladder UDFs;
- some paths live under ``/private/`` which some hosts' robots disallow.

``text`` is constructed from the same parts as ``html``; tests assert
``extract_text(html) == text`` row-for-row at small scale (template
consistency), which makes bench-scale generation cheap.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from .functions.extract import _normalize_ws  # shared kernel (parity)

BASE_EPOCH = datetime(2025, 7, 25, 0, 0, 0)

_WORDS = (
    "crawl frontier fetch schedule parse extract dedup host page link "
    "queue politeness robots round commit snapshot shard filter hash "
    "token quality corpus sample vector index batch merge emit"
).split()

# href query keys must not collide with HTML entity names (charref parsing)
_QKEYS = ("id", "b", "z", "pg")


def _words(rng: np.random.Generator, n: int) -> str:
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n))


def gen_corpus(
    n_urls: int = 2000,
    n_hosts: int = 40,
    seed: int = 42,
    zipf_s: float = 1.2,
    max_outlinks: int = 8,
    dup_frac: float = 0.02,
    noise_frac: float = 0.10,
    private_frac: float = 0.08,
    feature_every: int = 7,
    seed_frac: float | None = None,
) -> dict[str, pd.DataFrame]:
    """Generate ``pages``, ``seeds``, ``hosts`` pandas DataFrames."""
    rng = np.random.default_rng(seed)
    hosts = [f"host{i:03d}.example" for i in range(n_hosts)]
    weights = 1.0 / np.power(np.arange(1, n_hosts + 1), zipf_s)
    weights /= weights.sum()
    host_idx = rng.choice(n_hosts, size=n_urls, p=weights)
    is_private = rng.random(n_urls) < private_frac

    # canonical urls (the identity of each page)
    canon_urls = np.array(
        [
            f"https://{hosts[host_idx[i]]}"
            f"/{'private' if is_private[i] else 'p'}/{i}"
            for i in range(n_urls)
        ]
    )

    # noisy surface form for ~10% of rows (what appears in pages.url and in
    # some hrefs) — canonicalization must recover the canonical form.
    noisy = rng.random(n_urls) < noise_frac
    noise_kind = rng.integers(0, 4, n_urls)
    surface = canon_urls.copy()
    for i in np.flatnonzero(noisy):
        u = canon_urls[i]
        k = noise_kind[i]
        schemeless = u[len("https://"):]
        host, _, path = schemeless.partition("/")
        if k == 0:
            surface[i] = f"https://{host.upper()}/{path}"
        elif k == 1:
            surface[i] = f"{u}#section-{i % 5}"
        elif k == 2:
            surface[i] = f"https://{host}:443/{path}"
        else:
            a, b = _QKEYS[i % len(_QKEYS)], _QKEYS[(i + 1) % len(_QKEYS)]
            surface[i] = f"{u}?{b}=2&{a}=1"

    # outlink graph: each page links to k others (closure over the table)
    n_links = rng.integers(0, max_outlinks + 1, n_urls)
    rows = []
    for i in range(n_urls):
        h = hosts[host_idx[i]]
        title = f"Page {i} on {h}"
        paras = [_words(rng, int(rng.integers(8, 20))) for _ in range(int(rng.integers(1, 4)))]
        targets = rng.integers(0, n_urls, n_links[i])
        hrefs = [str(surface[t]) for t in targets]
        anchors = [f"link {int(t)}" for t in targets]
        # admission-filter fodder: malformed / off-scope hrefs
        junk = []
        if i % 11 == 0:
            junk = ["javascript:void(0)", "mailto:x@example.com", "ftp://host000.example/f"]
        feat = i % feature_every == 0
        rating = round(float(rng.integers(10, 51)) / 10.0, 1) if feat else None
        reviews = int(rng.integers(1, 5000)) if feat else None
        engaged = feat and (i % (2 * feature_every) == 0)

        body_parts = [f"<h1>{title}</h1>"]
        text_parts = [title, title]  # title tag + h1
        if feat:
            body_parts.append(f'<span class="rating">{rating}</span>')
            text_parts.append(str(rating))
            body_parts.append(f"<p>({reviews} total reviews)</p>")
            text_parts.append(f"({reviews} total reviews)")
            if engaged:
                body_parts.append("<p>Engaged Employer</p>")
                text_parts.append("Engaged Employer")
        for p in paras:
            body_parts.append(f"<p>{p}</p>")
            text_parts.append(p)
        for href, anchor in zip(hrefs + junk, anchors + ["x"] * len(junk)):
            body_parts.append(f'<a href="{href}">{anchor}</a>')
            text_parts.append(anchor)
        html = (
            f"<html><head><title>{title}</title>"
            f"<script>var x=1;</script></head><body>"
            + "".join(body_parts)
            + "</body></html>"
        )
        text = _normalize_ws(" ".join(text_parts))
        lang = "en" if (i * 2654435761) % 100 < 95 else ("de" if i % 2 else "fr")
        rows.append(
            {
                "url": str(surface[i]),
                "warc_ts": BASE_EPOCH + timedelta(seconds=int(i)),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": lang,
            }
        )

    # ~2% newest-wins duplicates: same url, later warc_ts, extra paragraph
    n_dups = int(n_urls * dup_frac)
    dup_ids = rng.choice(n_urls, size=n_dups, replace=False)
    for j, i in enumerate(sorted(int(x) for x in dup_ids)):
        base = rows[i]
        extra = _words(rng, 6)
        html = base["html"].decode("utf-8").replace(
            "</body>", f"<p>{extra}</p></body>"
        )
        rows.append(
            {
                "url": base["url"],
                "warc_ts": base["warc_ts"] + timedelta(days=1, seconds=j),
                "html": html.encode("utf-8"),
                "text": _normalize_ws(base["text"] + " " + extra),
                "lang": base["lang"],
            }
        )

    pages = pd.DataFrame(rows)
    pages["warc_ts"] = pd.to_datetime(pages["warc_ts"]).astype("datetime64[us]")

    # seeds: deterministic subset of known urls + a few unknown (miss path)
    n_seeds = (
        max(4, int(n_urls * seed_frac)) if seed_frac is not None else max(4, n_urls // 100)
    )
    seed_ids = rng.choice(n_urls, size=n_seeds, replace=False)
    seed_rows = [
        {
            "url": str(surface[int(i)]),
            "priority": int(i) % 3,
            "record_id": f"rec{int(i):06x}",
        }
        for i in sorted(int(x) for x in seed_ids)
    ]
    seed_rows.append({"url": "https://unknown.example/p/0", "priority": 0, "record_id": "recmiss"})
    seeds = pd.DataFrame(seed_rows)

    # hosts dim: robots + politeness clocks (FIXTURES.md §3)
    host_rows = []
    for i, h in enumerate(hosts):
        disallow_private = i % 3 == 0
        has_delay = i % 4 == 0
        delay_s = 1 + (i % 5)
        robots = ["User-agent: *"]
        if disallow_private:
            robots.append("Disallow: /private/")
        if has_delay:
            robots.append(f"Crawl-delay: {delay_s}")
        crawl_delay_ms = delay_s * 1000 if has_delay else 2000 + (i * 937) % 3001
        host_rows.append(
            {
                "host": h,
                "robots_txt": "\n".join(robots),
                "crawl_delay_ms": int(crawl_delay_ms),
                "next_allowed_ts": BASE_EPOCH,
            }
        )
    hosts_df = pd.DataFrame(host_rows)
    hosts_df["next_allowed_ts"] = pd.to_datetime(hosts_df["next_allowed_ts"]).astype(
        "datetime64[us]"
    )
    return {"pages": pages, "seeds": seeds, "hosts": hosts_df}


def to_spark(spark, corpus: dict[str, pd.DataFrame]):
    """Convert the pandas corpus to Spark DataFrames with pinned schemas."""
    from . import schemas

    return {
        "pages": spark.createDataFrame(corpus["pages"], schema=schemas.PAGES),
        "seeds": spark.createDataFrame(corpus["seeds"], schema=schemas.SEEDS),
        "hosts": spark.createDataFrame(corpus["hosts"], schema=schemas.HOSTS),
    }


def write_corpus(corpus: dict[str, pd.DataFrame], out_dir: str) -> None:
    """Cache a corpus as parquet (bench-scale generation is one-time)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, df in corpus.items():
        # small row groups keep the scan splittable (a single row group is
        # one unsplittable input partition — serializes the first UDF stage)
        df.to_parquet(
            os.path.join(out_dir, f"{name}.parquet"), index=False, row_group_size=8192
        )
