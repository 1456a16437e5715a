"""Minimal conllu.parse_incr stub for running the
reference evaluator (the real package is absent in this environment).
Reproduces exactly the parsing slice /root/reference/eval.py uses:
blank-line-separated blocks, tab-split columns zipped with the given
fields (extra columns dropped), '#' comment lines skipped."""


def parse_incr(f, fields=None):
    current = []
    for line in f:
        line = line.rstrip("\n")
        if not line.strip():
            if current:
                yield current
                current = []
            continue
        if line.startswith("#"):
            continue
        current.append(dict(zip(fields, line.split("\t"))))
    if current:
        yield current
