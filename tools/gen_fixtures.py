#!/usr/bin/env python3
"""Generate the deterministic Forem-article ingest fixtures (FIXTURES.md §A).

Run once from the repo root; output is committed under fixtures/. Layout:

  fixtures/articles/page=N/articles.json   pretty-printed JSON arrays
                                           (reference blob format,
                                           /root/reference/fetch_articles.py:130),
                                           hive page= dirs so both Spark and
                                           DuckDB read `page` as a column
  fixtures/articles_jsonl/articles.jsonl   line-delimited w/ 2 corrupt lines
                                           (PERMISSIVE/DROPMALFORMED tests)
  fixtures/checkpoints/latest_timestamp.json  {"latest_timestamp": ...} (O13)
  fixtures/checkpoints/backfill_page.json     {"page": 0} — tests the
                                              max(1, page) floor
                                              (fetch_articles_backfill.py:42)
  fixtures/prices.csv                      CSV scan fixture

Semantics cases planted (SURVEY.md §2.1 fine print):
  - newest-first order, watermark 2025-06-01T12:00:00Z
  - id 403 published exactly AT the watermark → must be dropped (strict >)
  - id 106 missing published_at, id 107 garbage, id 207 null → skipped rows
  - page 4 goes stale mid-page; pages 5 is all-old; page 6 is empty
"""
import json
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures")

TAGS = ["python", "spark", "scala", "data", "webdev", "tutorial"]


def article(i, ts, title=None, org=False):
    a = {
        "type_of": "article",
        "id": i,
        "title": title or f"Article {i}",
        "description": f"Description of article {i}",
        "published": True,
        "published_at": ts,
        "slug": f"article-{i}",
        "url": f"https://dev.to/u{i % 7}/article-{i}",
        "comments_count": i % 13,
        "public_reactions_count": (i * 7) % 101,
        "reading_time_minutes": 1 + i % 9,
        "tag_list": [TAGS[i % len(TAGS)], TAGS[(i * 3 + 1) % len(TAGS)]],
        "user": {
            "name": f"User {i % 7}",
            "username": f"u{i % 7}",
            "user_id": 1000 + i % 7,
        },
    }
    if org:
        a["organization"] = {"name": f"Org {i % 3}", "username": f"org{i % 3}"}
    if ts is None:
        a["published_at"] = None
    elif ts == "MISSING":
        del a["published_at"]
    return a


PAGES = {
    1: [article(101, "2025-06-10T09:30:00Z"),
        article(102, "2025-06-10T08:15:00Z", org=True),
        article(103, "2025-06-09T22:45:00Z"),
        article(104, "2025-06-09T12:00:00Z"),
        article(105, "2025-06-09T03:10:00Z"),
        article(106, "MISSING"),               # no published_at → skipped
        article(107, "not-a-timestamp")],      # unparsable → skipped
    2: [article(201, "2025-06-08T20:00:00Z"),
        article(202, "2025-06-08T11:30:00Z", org=True),
        article(203, "2025-06-07T19:20:00Z"),
        article(204, "2025-06-07T07:05:00Z"),
        article(205, "2025-06-06T23:59:59Z"),
        article(206, "2025-06-06T06:06:06Z"),
        article(207, None)],                   # null published_at → skipped
    3: [article(301, "2025-06-05T18:00:00Z"),
        article(302, "2025-06-05T05:30:00Z"),
        article(303, "2025-06-04T16:45:00Z", org=True),
        article(304, "2025-06-04T04:20:00Z"),
        article(305, "2025-06-03T15:00:00Z")],
    4: [article(401, "2025-06-02T14:30:00Z"),
        article(402, "2025-06-02T02:10:00Z"),
        article(403, "2025-06-01T12:00:00Z"),  # == watermark → strict > drops
        article(404, "2025-05-30T10:00:00Z"),
        article(405, "2025-05-29T21:00:00Z")],
    5: [article(501, "2025-05-25T09:00:00Z"),
        article(502, "2025-05-24T17:30:00Z", org=True),
        article(503, "2025-05-23T13:15:00Z"),
        article(504, "2025-05-22T01:45:00Z")],
    6: [],                                     # empty page terminates the scan
}


def main():
    for page, arts in PAGES.items():
        d = os.path.join(ROOT, "articles", f"page={page}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "articles.json"), "w") as f:
            json.dump(arts, f, indent=2, sort_keys=True)

    d = os.path.join(ROOT, "articles_jsonl")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "articles.jsonl"), "w") as f:
        for page in (1, 2):
            for a in PAGES[page]:
                f.write(json.dumps(a, sort_keys=True) + "\n")
            f.write('{"id": broken not json\n')  # corrupt line per page batch

    d = os.path.join(ROOT, "checkpoints")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "latest_timestamp.json"), "w") as f:
        json.dump({"latest_timestamp": "2025-06-01T12:00:00Z"}, f)
    with open(os.path.join(d, "backfill_page.json"), "w") as f:
        json.dump({"page": 0}, f)  # floored to 1 by the cursor load

    with open(os.path.join(ROOT, "prices.csv"), "w") as f:
        f.write("sku,category,price,in_stock\n")
        for i in range(1, 21):
            f.write(f"SKU{i:03d},{['widget','gadget','gizmo'][i % 3]},{i * 7 + 0.5},{str(i % 2 == 0).lower()}\n")

    print("fixtures written under", os.path.abspath(ROOT))


if __name__ == "__main__":
    main()
