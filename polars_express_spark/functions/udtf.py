"""Python UDTF surface (SURVEY.md §2.10 UDTF row).

The reference's morally-UDTF analog is the dead HTML link scraper
(src/scraper.rs:11-28: fetch a page, yield every <a href>). The network
fetch stays out of scope (dead code there, no network here); the
table-function SHAPE — one input row in, N extracted rows out — is
re-expressed as a Spark 3.5+ Python UDTF usable from SQL via LATERAL.

UDTFs are row-at-a-time Python — the slow path by design. Use them for
genuinely generative row logic like this; set-oriented extraction at
scale should prefer JVM-side `regexp_extract_all` + `explode` (the
oracled q_udtf_links query exists precisely to prove both give the same
answer).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_HREF = re.compile(r"""href=["']([^"']+)["']""")


@udtf(returnType="link: string")
class ExtractLinks:
    """Yield one row per href target in an HTML fragment
    (reference scraper.rs:18-26 extracts the same attribute)."""

    def eval(self, html: str):
        if html:
            for m in _HREF.finditer(html):
                yield (m.group(1),)


def register(spark) -> None:
    spark.udtf.register("extract_links", ExtractLinks)
