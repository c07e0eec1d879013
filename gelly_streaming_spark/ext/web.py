"""URL / domain curation — the web-provenance half of a pre-training
corpus pipeline (C4/RefinedWeb-style): canonicalize crawl URLs, extract
the registered domain, and filter against a domain blocklist.

North-star extension (BASELINE.json): no reference counterpart
(gelly-streaming has no document surface).

Everything here is pure column expressions in the Java∩RE2 regex
dialect (the same discipline as ``ext/text.PII_PATTERNS``), so the
operators fuse into the scan with zero shuffles/UDFs AND the DuckDB
oracle can apply the identical transformations (q49).

Canonical form (documented contract, applied in order):
  1. scheme and host lowercased (path/query case preserved)
  2. fragment dropped (``#...``)
  3. tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``),
     with a dangling ``?``/``&`` cleaned up
  4. default ports stripped (``:80`` for http, ``:443`` for https)
  5. trailing slash dropped from a bare host path

Registered domain: the last TWO host labels, or the last THREE when the
suffix is a known multi-part public suffix (co.uk-style). The in-repo
list covers the dominant multi-part suffixes; production swaps in the
full Public Suffix List through the same ``multi_suffixes`` parameter —
the plan shape (one regexp per row, no join) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-part public suffixes — a vendored excerpt of the ICANN section
# of the Public Suffix List (publicsuffix.org, public data; ~300 of the
# most-trafficked ccTLD second-level registries). Production passes the
# full PSL through the same parameter; the operator only builds a bigger
# alternation, the plan shape (one regexp per row, no join) is unchanged.
MULTI_SUFFIXES: tuple[str, ...] = (
    # United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "nhs.uk",
    "police.uk", "plc.uk", "ltd.uk", "me.uk",
    # Australia (state education registries are 3-label)
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
    # Japan
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz", "mil.nz",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "adv.br",
    "blog.br", "eco.br", "mil.br", "wiki.br", "ind.br", "inf.br",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    # Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "av.tr", "bbs.tr",
    "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr",
    "name.tr", "tel.tr", "web.tr", "tv.tr", "pol.tr", "mil.tr",
    # Argentina
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "tur.ar", "musica.ar",
    # Mexico
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    # India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    # South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    "busan.kr",
    # South Africa
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "mil.za", "nom.za",
    # Indonesia
    "co.id", "or.id", "ac.id", "go.id", "mil.id", "net.id", "web.id",
    "sch.id", "biz.id", "my.id", "desa.id",
    # Israel
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "idf.il",
    # Thailand
    "co.th", "or.th", "ac.th", "go.th", "in.th", "mi.th", "net.th",
    # Singapore
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    # Malaysia
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    # Philippines
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
    "i.ph",
    # Vietnam
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    # Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "mil.tw", "idv.tw",
    "game.tw", "ebiz.tw", "club.tw",
    # Hong Kong
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    # Pakistan
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "fam.pk", "biz.pk",
    "web.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk", "gos.pk",
    # Bangladesh / Sri Lanka / Nepal
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd", "mil.bd",
    "com.lk", "net.lk", "org.lk", "edu.lk", "gov.lk", "sch.lk", "ngo.lk",
    "int.lk", "soc.lk", "web.lk", "ltd.lk", "grp.lk", "hotel.lk",
    "com.np", "net.np", "org.np", "edu.np", "gov.np", "mil.np",
    # Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "biz.pl", "mil.pl",
    # Russia / Ukraine
    "com.ru", "net.ru", "org.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru",
    "ac.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "co.ua",
    "biz.ua", "kiev.ua", "lviv.ua", "kharkiv.ua", "odessa.ua",
    # Greece / Portugal / Romania / Hungary / Spain / Italy / France
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt",
    "nome.pt",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "gov.it", "edu.it",
    "gouv.fr", "asso.fr", "com.fr", "nom.fr", "prd.fr", "tm.fr",
    "avocat.fr", "port.fr",
    # Austria
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    # Latin America
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "arts.co", "firm.co", "info.co", "int.co", "rec.co", "web.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "gob.cl", "gov.cl", "mil.cl", "co.cl",
    "com.ve", "net.ve", "org.ve", "co.ve", "edu.ve", "gob.ve", "info.ve",
    "mil.ve", "web.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "gov.ec",
    "info.ec", "fin.ec", "k12.ec", "med.ec", "mil.ec", "pro.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "mil.py", "coop.py",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo",
    "tv.bo", "web.bo",
    "co.cr", "ac.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "gov.do", "mil.do",
    "sld.do", "art.do", "web.do",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt",
    "gc.ca",
    # Middle East / Africa
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "eun.eg", "mil.eg",
    "name.eg", "sci.eg",
    "co.ma", "net.ma", "org.ma", "gov.ma", "ac.ma", "press.ma",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "name.ng",
    "sch.ng", "mobi.ng", "mil.ng", "i.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "co.tz", "ac.tz", "go.tz", "or.tz", "ne.tz", "sc.tz", "mil.tz",
    "tv.tz", "info.tz", "me.tz", "mobi.tz",
    "co.ug", "or.ug", "ac.ug", "sc.ug", "go.ug", "ne.ug", "com.ug",
    "org.ug",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa", "edu.sa",
    "sch.sa",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    "com.kw", "edu.kw", "emb.kw", "gov.kw", "ind.kw", "net.kw", "org.kw",
    "com.qa", "edu.qa", "gov.qa", "mil.qa", "name.qa", "net.qa", "org.qa",
    "sch.qa",
    "co.om", "com.om", "edu.om", "gov.om", "med.om", "net.om", "org.om",
    "pro.om",
    "com.jo", "org.jo", "net.jo", "edu.jo", "sch.jo", "gov.jo", "mil.jo",
    "name.jo",
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
)


def suffix_alternation(multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES) -> str:
    """Escaped regex alternation over the multi-part suffixes, DEEPEST
    first: both Java regex and RE2 (DuckDB) try alternatives
    leftmost-first, so ``nsw.edu.au`` must precede ``edu.au`` or a host
    under the 3-label registry would resolve to the 2-label suffix.
    Shared by the engine and the q49 oracle — one source of truth."""
    ordered = sorted(multi_suffixes, key=lambda s: (-s.count("."), s))
    return "|".join(s.replace(".", r"\.") for s in ordered)

_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
_TRACKING = r"(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    """Apply the module's canonical form (see module docstring). Every
    pattern is lookaround-free (RE2-compatible) so the oracle replays
    the identical pipeline — default-port stripping captures the
    following delimiter instead of looking ahead at it."""
    # 1. lowercase scheme+host only: rebuild as lower(prefix) + rest
    prefix = F.regexp_extract(url, _SCHEME_HOST, 1)
    u = F.concat(F.lower(prefix), url.substr(F.length(prefix) + 1, F.length(url)))
    # 2. drop fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. drop tracking params, then clean a dangling '?'/'&' and '?&'
    u = F.regexp_replace(u, _TRACKING, "")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 4. strip default ports (delimiter captured, not looked-ahead)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80($|[/?#])", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443($|[/?#])", "$1$2")
    # 5. trailing slash on a bare host
    u = F.regexp_replace(u, r"^([A-Za-z0-9+.-]+://[^/?#]+)/$", "$1")
    return u


def url_host(url: Column) -> Column:
    """Lowercased host (no port) of a URL."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))


def registered_domain(
    host: Column, multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES
) -> Column:
    """Registered (pay-level) domain of a lowercased host: last two
    labels, or one label more than a matching multi-part public suffix
    (the suffix list may hold entries of any depth — the alternation is
    tried deepest-first, see :func:`suffix_alternation`)."""
    alt = suffix_alternation(multi_suffixes)
    three = F.regexp_extract(host, rf"([^.]+\.({alt}))$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(three != "", three).otherwise(two)


def domain_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES,
    pin_derived: bool = False,
) -> DataFrame:
    """Append ``url_canon``, ``domain``, and ``blocked`` to ``docs``.

    ``blocklist`` is a one-column (``domain``) table of registered
    domains to flag. Scale shape: the projection fuses into the scan;
    the blocklist (small by nature — even industry lists are ~10⁵ rows)
    joins as an AQE broadcast LEFT SEMI probe marked via a left join on
    the derived domain, so the corpus never shuffles.

    ``pin_derived=True`` barriers the derived columns with a lazy
    localCheckpoint BEFORE the join. Default off — at corpus scale the
    fused one-pass projection is the right shape and a checkpoint would
    materialize the corpus. It exists for BOUNDED certification/test
    runs: without the barrier Catalyst inlines the full regex trees
    (canonical URL + domain, plus whatever expression built ``url_col``)
    into the join key and every output column, and the one-time janino
    compile of that stage measured ~4–10 s — 10x the query's actual
    work at small scale."""
    u = canonicalize_url(F.col(url_col))
    dom = registered_domain(url_host(F.col(url_col)), multi_suffixes)
    out = docs.withColumn("url_canon", u).withColumn("domain", dom)
    if pin_derived:
        out = out.localCheckpoint(eager=False)
    # distinct() before the probe: real-world blocklists carry repeats,
    # and a duplicated domain row would silently MULTIPLY matching corpus
    # rows through the left join (ADVICE r8). The distinct runs on the
    # small side only — the corpus still never shuffles.
    bl = (
        blocklist.select(F.col("domain").alias("domain"))
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return (
        out.join(F.broadcast(bl), "domain", "left")
        .withColumn("blocked", F.coalesce(F.col("blocked"), F.lit(False)))
    )
