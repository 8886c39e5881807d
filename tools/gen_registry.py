"""Deterministic synthetic registry-text generator (parse benchmarking).

Emits the reference's line format (labels from fieldspec, page markers
from scrape.py:66, multi-member-state duplication per README.md:17) at
an arbitrary trial count, so ingest throughput can be measured at sizes
approaching the real ~2 GB dump. Content is seeded and value-varied per
member state so the first-non-empty merge, IMP fuzzy merge, and location
blocks all do real work.
"""

from __future__ import annotations

import random
import sys

STATUSES = ["Ongoing", "Completed", "Prematurely Ended", ""]
COUNTRIES = ["Austria", "Belgium", "France", "Germany", "Spain", "Italy", "Poland"]
OUTSIDE = ["United States", "Japan", "Brazil", "Canada"]
YN = ["Yes", "No", ""]


def write_registry(path: str, n_trials: int, seed: int = 42) -> int:
    rng = random.Random(seed)
    n_lines = 0
    with open(path, "w", encoding="utf8") as f:

        def w(line: str) -> None:
            nonlocal n_lines
            f.write(line + "\n")
            n_lines += 1

        page = 1
        for t in range(n_trials):
            eid = f"20{t % 20:02d}-{t:06d}-{t % 89:02d}"
            n_states = 1 + t % 3
            for s in range(n_states):
                if rng.random() < 0.2:
                    w(f"### PAGE {page} ####")
                    page += 1
                w(f"EudraCT Number: {eid}")
                w(f"National Competent Authority: {COUNTRIES[(t + s) % len(COUNTRIES)]} - competent authority")
                # later member states leave some fields blank -> the
                # first-non-empty merge has to do real work
                w(f"Trial Status: {STATUSES[(t + s) % len(STATUSES)]}")
                if s == 0 or rng.random() < 0.5:
                    w(f"A.3 Full title of the trial: Study {t} of Compound-{t % 500}")
                w(f"A.4.1 Sponsor's protocol code number: PROT-{t:05d}")
                w(f"B.1.1 Name of Sponsor: sponsor {'alpha' if s % 2 == 0 else 'beta'} {t % 50}")
                w(f"B.5.1 Name of organisation: org {t % 50}")
                w(f"B.5.6 E-mail: contact{t % 50}@example.org")
                w(f"D.8.1 Is a Placebo used in this Trial? {YN[(t + s) % 3]}")
                w(f"E.1.1 Medical condition(s) being investigated: Condition {t % 200}")
                w(f"E.7.1 Human pharmacology (Phase I): {YN[t % 2]}")
                w(f"E.7.2 Therapeutic exploratory (Phase II): {YN[(t + 1) % 2]}")
                w(f"E.8.1.1 Randomised: {YN[(t + s) % 3]}")
                w(f"F.2.1 Female: Yes")
                w(f"F.2.2 Male: {YN[t % 2]}")
                w(f"F.4.2.2 In the whole clinical trial: {100 + t % 4000}")
                # IMP blocks: overlapping names across states -> fuzzy merge
                for imp in range(1 + (t + s) % 2):
                    w(f"D.IMP: {imp + 1}")
                    w(f"D.2.1.1.1 Trade name: Trade-{(t + imp) % 300}")
                    if (s + imp) % 2 == 0:
                        w(f"D.3.1 Product name: Product-{(t + imp) % 300}")
                    else:
                        w(f"D.3.2 Product code: C-{(t + imp) % 300}")
                # non-EEA location block on some records
                if (t + s) % 4 == 0:
                    w("E.8.6.3 If E.8.6.1 or E.8.6.2 are Yes, specify the regions in which trial sites are planned")
                    w(OUTSIDE[t % len(OUTSIDE)])
                    w("E.8.7 Trial has a data monitoring committee")
                if s == 0:
                    w(f"P. Date of the global end of the trial: 20{t % 20:02d}-12-31")
    return n_lines


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/registry_bench.txt"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    print(f"{write_registry(path, n)} lines -> {path}")
