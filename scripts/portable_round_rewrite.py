"""One-shot source rewrite: engine-portable rounding (round-5 VERDICT #1).

Replaces every rounded-double output with the bit-portable form
``floor(x * 1e<nd> + 0.5) / 1e<nd>`` — a composition of individually
correctly-rounded IEEE-754 ops (mul, add, floor, div), so ANY two IEEE
engines produce the same double.  ``round(x, nd)`` tie behavior is
engine/version-specific (the r4 driver reds dup_spans / tf_cosine were
exactly this class), while this form is value-identical to Spark's
HALF_UP round everywhere except exact negative ties.

  - Spark sites:  F.round(<e>, <nd>)  ->  _p6(<e>[, <nd>])   (entry file)
                                      ->  pround(<e>[, <nd>]) (library)
  - SQL sites:    round(<e>, <nd>)    ->  floor((<e>) * 1e<nd> + 0.5) / 1e<nd>

Run once from the repo root; review with git diff.

ALREADY APPLIED (round 5) — kept for the audit trail. Do NOT re-run
blindly: the SQL-site regex matches bare ``round(`` anywhere in the
entry file's SOURCE, not just inside SQL string literals, so a future
Python-level ``round(x, 6)`` call would be rewritten into invalid
Python. New code should call combblas_spark.portable.pround /
pround_py / pround_sql directly instead.
"""
import re
import sys

ENTRY = "__spark_entry__.py"


def _find_close(src: str, i: int) -> int:
    depth = 1
    while depth:
        c = src[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    return i  # index AFTER the closing paren


def _split_last_arg(inner: str):
    depth = 0
    last = None
    for j, ch in enumerate(inner):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            last = j
    if last is None:
        return inner, None
    head, tail = inner[:last], inner[last + 1:].strip()
    if tail == "":  # trailing comma: F.round(expr, 6,) — re-split the head
        return _split_last_arg(head)
    return head, tail


def rewrite_spark(src: str, helper: str):
    out, pos, n = [], 0, 0
    for m in re.finditer(r"F\.round\(", src):
        if m.start() < pos:
            continue
        end = _find_close(src, m.end())
        expr, nd = _split_last_arg(src[m.end():end - 1])
        if nd not in ("6", "9", "3", "4"):
            continue  # not a literal-digits site; leave alone
        out.append(src[pos:m.start()])
        if nd == "6":
            out.append(f"{helper}({expr})")
        else:
            out.append(f"{helper}({expr}, {nd})")
        pos = end
        n += 1
    out.append(src[pos:])
    return "".join(out), n


def rewrite_sql(src: str):
    out, pos, n = [], 0, 0
    for m in re.finditer(r"(?i)(?<![\w.])round\(", src):
        if m.start() < pos:
            continue
        end = _find_close(src, m.end())
        expr, nd = _split_last_arg(src[m.end():end - 1])
        if nd not in ("6", "9", "3", "4"):
            continue
        out.append(src[pos:m.start()])
        out.append(f"floor(({expr}) * 1e{nd} + 0.5) / 1e{nd}")
        pos = end
        n += 1
    out.append(src[pos:])
    return "".join(out), n


def main():
    # 1. entry file: Spark sites then SQL sites (to fixpoint — nested
    # round() inside an outer rewritten span needs another pass)
    src = open(ENTRY).read()
    a = b = 0
    while True:
        src, da = rewrite_spark(src, "_p6")
        src, db = rewrite_sql(src)
        a, b = a + da, b + db
        if not (da or db):
            break
    open(ENTRY, "w").write(src)
    print(f"{ENTRY}: {a} Spark sites, {b} SQL sites")

    # 2. library files
    for path in sys.argv[1:]:
        src = open(path).read()
        a = 0
        while True:
            src, da = rewrite_spark(src, "pround")
            a += da
            if not da:
                break
        if a:
            open(path, "w").write(src)
        print(f"{path}: {a} Spark sites")


if __name__ == "__main__":
    main()
