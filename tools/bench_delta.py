"""Per-query delta between two bench JSONs (graft.Bench one-line output or
the driver's BENCH_r*.json wrapper) — the regression tripwire VERDICT r5
item 8 asked for: any query >2x its prior time (and >1s absolute, to keep
fixed-overhead noise out) is listed loudly.

Usage: python3 tools/bench_delta.py <before.json> <after.json> [ratio]
Exit code 1 when regressions are found.
"""
import json, sys


def load(path):
    raw = open(path).read()
    i = raw.find('{"metric"')
    if i >= 0:  # raw graft.Bench line (possibly inside a log)
        j = raw.find('\n', i)
        return json.loads(raw[i:] if j < 0 else raw[i:j])
    d = json.loads(raw)
    # driver wrapper: {"parsed": {...}} or already-parsed shape
    if 'queries' in d:
        return d
    return d.get('parsed', d)


def main():
    before, after = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    bq, aq = before['queries'], after['queries']
    regressions, improved = [], []
    for q in sorted(aq):
        b, a = bq.get(q), aq[q]
        if b is None:
            print(f'NEW      {q}: {a:.2f}s (no prior sample)')
            continue
        if a > b * ratio and a - b > 1.0:
            regressions.append((q, b, a))
        elif b > a * ratio and b - a > 1.0:
            improved.append((q, b, a))
    for q, b, a in sorted(improved, key=lambda t: t[1] - t[2]):
        print(f'IMPROVED {q}: {b:.2f}s -> {a:.2f}s ({b / a:.1f}x)')
    for q, b, a in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f'REGRESSED {q}: {b:.2f}s -> {a:.2f}s ({a / b:.1f}x)')
    tb = before.get('value'), after.get('value')
    if all(tb):
        print(f'TOTAL {tb[0]:.1f}s -> {tb[1]:.1f}s')
    print(f'regressions: {len(regressions)}')
    sys.exit(1 if regressions else 0)


if __name__ == '__main__':
    main()
