"""Deterministic synthetic interleaved-docs corpus (tables A1 of FIXTURES.md).

The sandbox has no live web, and the 10^10-URL design point needs a corpus
whose every byte is a pure function of ``(seed_tag, host_index)`` so that

* the sequential Python oracle (``web_crawler_spark.oracle``) and
* the distributed Spark generator (``generate_documents_df``)

materialize bit-identical documents without any cross-communication — which
is also what makes corpus generation embarrassingly parallel at scale
(``mapInPandas`` over a ``spark.range``; no shuffle at all).

Shape is fixed by BASELINE.json ``input_hint``::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

``doc_id`` is the canonical full URL key ``http_type + name`` (normalized
form: uppercase, scheme kept as the ``HTTP://``/``HTTPS://`` prefix, no
leading ``WWW.`` — reference normalization semantics,
/root/reference/shared/src/url_normalize.rs:8-22).  Text spans embed raw
(decorated lower-case / ``www.``-prefixed) links extractable by the
reference regex ``https?://[\\w\\-.]+(?::\\d+)?``
(/root/reference/shared/src/crawler.rs:8-9); media spans interleave with
``text=''`` and a ``media_ref``; ``offset`` is strictly increasing per row
(the per-row span-sequence invariant).

Generator knobs reproduce the reference's test surface: duplicate links in
one page (crawler.rs:85-93), ports (crawler.rs:105-113), ``www.`` variants
(url_normalize.rs:28-45), subdomain depth 1-4 (dns.rs:15-48 shortening),
hot-host out-degree skew (axis B politeness/salting), and dead links
(targets with no document => simulated 404).
"""

from __future__ import annotations

from dataclasses import dataclass

from .functions.urls import HTTP, HTTPS
from .functions.xxh64 import pmod, xxhash64_str


@dataclass(frozen=True)
class CorpusParams:
    n_docs: int = 200            # URLs that have a document
    dead_link_pct: int = 12      # extra URL universe => 404 targets
    urls_per_host: int = 6       # mean URLs sharing one base host (politeness)
    seed_tag: str = "v1"
    links_per_span_max: int = 4
    spans_min: int = 3
    spans_max: int = 7
    hot_pct: int = 25            # % of links aimed at the hot set
    dup_pct: int = 12            # % chance a link repeats the previous one
    www_pct: int = 15            # % of raw links decorated with "www."
    lower_pct: int = 80          # % of raw links rendered lower-case

    @property
    def n_hosts(self) -> int:
        return self.n_docs + (self.n_docs * self.dead_link_pct) // 100

    @property
    def n_bases(self) -> int:
        return max(1, self.n_docs // self.urls_per_host)

    @property
    def n_hot(self) -> int:
        return max(1, self.n_docs // 100)


_SUB_LABELS = ("API", "CDN", "BLOG", "SHOP", "NEWS", "M")
_PORTS = (":8080", ":9090")


def _h(params: CorpusParams, *parts: object) -> int:
    return xxhash64_str(params.seed_tag + "#" + "#".join(str(p) for p in parts))


def base_host_of(i: int, params: CorpusParams) -> int:
    """Base-host index of URL ``i`` — skewed so ~30% of URLs pile onto the
    hottest 5% of hosts (axis B: hot-domain skew for politeness/salting)."""
    if pmod(_h(params, "baseskew", i), 100) < 30:
        return pmod(_h(params, "hotbase", i), max(1, params.n_bases // 20))
    return pmod(_h(params, "unibase", i), params.n_bases)


def host_canonical(i: int, params: CorpusParams) -> tuple[str, str]:
    """Canonical ``(name, http_type)`` of URL index ``i`` — pure function.

    name: 0-3 extra subdomain labels + unique ``S{i:05d}`` label +
    shared ``BASE-{b:04d}.TEST`` base host + optional port, already in
    normalized form (uppercase, no scheme, no leading WWW.).  Many URLs
    share one base host (politeness target); the ``S{i}`` label keeps
    doc_ids collision-free.
    """
    r = pmod(_h(params, "sub", i), 100)
    n_sub = 0 if r < 60 else 1 if r < 85 else 2 if r < 95 else 3
    labels = [
        _SUB_LABELS[pmod(_h(params, "subl", i, k), len(_SUB_LABELS))]
        for k in range(n_sub)
    ]
    b = base_host_of(i, params)
    name = ".".join(labels + [f"S{i:05d}", f"BASE-{b:04d}", "TEST"])
    if pmod(_h(params, "port", i), 100) < 10:
        name += _PORTS[pmod(_h(params, "portn", i), len(_PORTS))]
    http_type = HTTPS if pmod(_h(params, "scheme", i), 100) < 70 else HTTP
    return name, http_type


def doc_id_for(i: int, params: CorpusParams) -> str:
    name, http_type = host_canonical(i, params)
    return http_type + name


def _raw_link(j: int, params: CorpusParams, salt: int) -> str:
    """Decorated raw URL for host ``j`` that canonicalizes to doc_id(j)."""
    name, http_type = host_canonical(j, params)
    scheme = "https://" if http_type == HTTPS else "http://"
    disp = name.lower() if pmod(_h(params, "case", j, salt), 100) < params.lower_pct else name
    www = "www." if pmod(_h(params, "www", j, salt), 100) < params.www_pct else ""
    return scheme + www + disp


def doc_spans(i: int, params: CorpusParams) -> list[dict]:
    """Interleaved spans of document ``i`` — pure function of (seed, i).

    Returns list of {kind, text, media_ref, offset} dicts with strictly
    increasing offsets (the per-row span-sequence invariant).
    """
    n_spans = params.spans_min + pmod(
        _h(params, "nspans", i), params.spans_max - params.spans_min + 1
    )
    spans: list[dict] = []
    offset = 0
    for s in range(n_spans):
        kr = pmod(_h(params, "kind", i, s), 100)
        kind = "text" if kr < 65 else "image" if kr < 90 else "video"
        if kind == "text":
            n_links = pmod(_h(params, "nlinks", i, s), params.links_per_span_max + 1)
            pieces = [f"span {s} of host {i} :"]
            prev_raw: str | None = None
            for k in range(n_links):
                if prev_raw is not None and pmod(_h(params, "dup", i, s, k), 100) < params.dup_pct:
                    raw = prev_raw  # duplicate link in-page (crawler.rs:85-93)
                else:
                    r = pmod(_h(params, "lt", i, s, k), 100)
                    if r < params.hot_pct:
                        j = pmod(_h(params, "hot", i, s, k), params.n_hot)
                    else:
                        j = pmod(_h(params, "uni", i, s, k), params.n_hosts)
                    raw = _raw_link(j, params, salt=pmod(_h(params, "dec", i, s, k), 1 << 30))
                # " ; " separator so the greedy [\w\-.]+ host class never
                # swallows surrounding punctuation into the captured URL
                pieces.append(f"see {raw} ;")
                prev_raw = raw
            text = " ".join(pieces)
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
            offset += len(text) + 1
        else:
            ref = f"media://{kind}/{i:05d}/{s}"
            spans.append({"kind": kind, "text": "", "media_ref": ref, "offset": offset})
            offset += 10 + pmod(_h(params, "mlen", i, s), 50)
    return spans


def build_corpus_py(params: CorpusParams) -> dict[str, list[dict]]:
    """Driver/oracle-side corpus: {doc_id: spans}. Only hosts < n_docs have docs."""
    return {doc_id_for(i, params): doc_spans(i, params) for i in range(params.n_docs)}


def good_seeds(corpus: dict, cfg, limit: int = 10) -> list[str]:
    """doc_ids whose root admission (single fetch + DNS) succeeds —
    deterministic seed selection for demos/tests/benches (driver-side,
    pure Python: mirrors the manager's root admission path)."""
    from .functions.urls import normalize_url_py  # noqa: PLC0415 — cycle guard
    from .sources.simulators import dns_py, fetch_outcome_py  # noqa: PLC0415

    out = []
    for did in corpus:
        name, _ = normalize_url_py(did)
        if dns_py(name, cfg)[0] and fetch_outcome_py(did, True, 0, cfg)[0]:
            out.append(did)
            if len(out) == limit:
                break
    return out


DOCUMENTS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def generate_documents_df(spark, params: CorpusParams, partitions: int = 32):
    """Distributed corpus generation: mapInPandas over a host-index range.

    Shuffle-free and linearly scalable — each task materializes its slice of
    the host space from the seed alone (the 100 TB-scale generation path).
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    def gen(batches):
        for pdf in batches:
            ids, spans = [], []
            for i in pdf["id"]:
                i = int(i)
                ids.append(doc_id_for(i, params))
                spans.append(doc_spans(i, params))
            yield pd.DataFrame({"doc_id": ids, "spans": spans})

    return (
        spark.range(0, params.n_docs, 1, partitions)
        .mapInPandas(gen, schema=DOCUMENTS_SCHEMA)
    )


def documents_df_from_py(spark, corpus: dict[str, list[dict]]):
    """Small-corpus path: exact same rows via createDataFrame (tests)."""
    rows = [
        (doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        for doc_id, spans in corpus.items()
    ]
    return spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
