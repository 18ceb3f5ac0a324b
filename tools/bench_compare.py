#!/usr/bin/env python3
"""Compare two BENCH_LOCAL_r*.json maps on their COMMON queries — the
machine-state control protocol (README 'Benchmarks and machine-state
control'): totals are only comparable on the shared query set."""
import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = json.load(open(a_path))["queries"]
    b = json.load(open(b_path))["queries"]
    common = sorted(set(a) & set(b))
    a_ok = {q: a[q] for q in common if a[q] >= 0 and b[q] >= 0}
    ta = sum(a_ok.values())
    tb = sum(b[q] for q in a_ok)
    print(f"{a_path}: {len(a)} queries; {b_path}: {len(b)} queries; "
          f"common-and-clean: {len(a_ok)}")
    print(f"common subtotal: {ta:.3f}s vs {tb:.3f}s  "
          f"(ratio {ta / tb if tb else float('nan'):.3f})")
    movers = sorted(((a[q] / b[q], q, a[q], b[q]) for q in a_ok
                     if b[q] > 0.05 and (a[q] / b[q] > 1.3 or a[q] / b[q] < 0.7)),
                    reverse=True)
    for r, q, av, bv in movers[:15]:
        print(f"  {q}: {bv:.2f}s -> {av:.2f}s ({r:.2f}x)")
    only_a = sorted(set(a) - set(b))
    if only_a:
        extra = sum(v for k, v in a.items() if k in only_a and v >= 0)
        print(f"new-only queries ({len(only_a)}): {extra:.1f}s  {only_a}")


if __name__ == "__main__":
    main()
