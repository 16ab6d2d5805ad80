"""Closed template vocabulary for deterministic corpus synthesis.

Design constraints (FIXTURES.md §1):
- ~200 entity surfaces across 4 types; no surface string collides across
  types (GlinerSparkModel.from_gazetteer enforces this).
- 8 relation patterns with directed connective phrases.
- Filler vocabulary is token-disjoint from entity surfaces and connectives
  so planted spans are unambiguous by construction.
- Entity draws are Zipfian -> hot linking blocks (skew is exercised).
"""

from __future__ import annotations

_FIRST = [
    "alice", "bruno", "chen", "daria", "emeka", "farah", "goran", "hana",
    "ivan", "jamal", "keiko", "lena", "marco", "nadia", "omar", "priya",
    "quentin", "rosa", "stefan", "tarek", "uma", "viktor", "wanda", "xiu",
    "yusuf",
]
_LAST = [
    "almeida", "borisov", "castillo", "dubois", "eriksen", "fontana",
    "gruber", "haddad", "ishikawa", "jensen", "kovacs", "lindqvist",
    "moreau", "novak", "okafor", "petrov", "quirke", "rossi", "sato",
    "tanaka", "ueda", "varga", "weber", "xu", "yamamoto",
]
PERSONS = [f"{f} {l}" for f, l in zip(_FIRST * 2, _LAST + _LAST[7:] + _LAST[:7])]  # 50

_ORG_STEM = [
    "acme", "globex", "initech", "umbrella", "hooli", "vandelay", "wonka",
    "cyberdyne", "tyrell", "weyland", "stark", "wayne", "oscorp", "dunder",
    "pied", "aperture", "blackmesa", "massive", "abstergo", "nuka",
    "zorg", "gekko", "duff", "soylent", "monarch",
]
_ORG_SUFFIX = ["corp", "industries"]
ORGS = [f"{s} {x}" for s in _ORG_STEM for x in _ORG_SUFFIX]  # 50

LOCATIONS = [
    "lisbon", "porto", "madrid", "seville", "toulouse", "lyon", "turin",
    "naples", "zagreb", "belgrade", "krakow", "gdansk", "tallinn", "riga",
    "vilnius", "bergen", "aarhus", "malmo", "tampere", "graz", "basel",
    "ghent", "rotterdam", "leipzig", "dresden", "brno", "kosice", "varna",
    "timisoara", "thessaloniki", "valencia", "bilbao", "bordeaux", "nantes",
    "genoa", "palermo", "split", "sarajevo", "skopje", "tirana",
    "cork", "galway", "dundee", "cardiff", "swansea", "bristol",
    "nagoya", "sapporo", "busan", "davao",
]  # 50

DATES = [
    f"{m} {y}"
    for y in ["2018", "2019", "2020", "2021", "2022", "2023"]
    for m in ["january", "april", "july", "october", "december"]
]  # 30

GAZETTEER = {
    "person": PERSONS,
    "organization": ORGS,
    "location": LOCATIONS,
    "date": DATES,
}

# relation -> (subject type, object type, connective phrases)
# first connective is the canonical generation phrase; extras are aliases
RELATION_PATTERNS = {
    "works_at": ("person", "organization", ["works at", "is employed by"]),
    "born_in": ("person", "location", ["was born in"]),
    "founded": ("person", "organization", ["founded", "established"]),
    "acquired": ("organization", "organization", ["acquired", "bought out"]),
    "based_in": ("organization", "location", ["is based in", "operates from"]),
    "visited": ("person", "location", ["visited", "traveled to"]),
    "founded_on": ("organization", "date", ["was launched in"]),
    "met_on": ("person", "date", ["joined the board in"]),
}

REL_PHRASES = {k: v[2] for k, v in RELATION_PATTERNS.items()}

# filler words: token-disjoint from every surface/connective token above
FILLER = [
    "meanwhile", "report", "quarterly", "figures", "showed", "steady",
    "growth", "despite", "turbulent", "market", "conditions", "analysts",
    "expect", "further", "expansion", "during", "upcoming", "fiscal",
    "period", "according", "sources", "familiar", "with", "matter",
    "several", "projects", "remain", "under", "review", "pending",
    "regulatory", "approval", "officials", "declined", "comment",
]

MEDIA_CAPTIONS = [
    "press photo", "headquarters aerial view", "product launch snapshot",
    "conference keynote still", "archival footage frame",
]
