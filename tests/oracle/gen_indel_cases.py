"""Case generator/packer for the indel-errprob oracle (oracle_indel.c).

--emit-input prints the oracle's stdin; --pack merges cases + oracle output
into tests/golden/indel_errprobs.json.
"""

import json
import random
import sys

BASES = "ACGT"


def rand_key(rng, lo=1, hi=6):
    return "".join(rng.choice(BASES) for _ in range(rng.randint(lo, hi)))


def gen_cases():
    rng = random.Random(20260817)
    cases = []
    for mode in (0, 1):
        for flags in (0, 1, 3, 5, 7):
            for _rep in range(4):
                key = rand_key(rng)
                nneq = rng.randint(0, 12)
                neq = [
                    (rng.randint(0, 60),
                     rng.choice([0, 13, 37, 60, 255]))  # raw mq incl. 255!
                    for _ in range(nneq)
                ]
                nev = rng.randint(0, 3)
                events = []
                keys = {key}
                for _e in range(nev):
                    # half the events match the candidate key (IDAQ gate)
                    if rng.random() < 0.5:
                        ekey = key
                    else:
                        ekey = rand_key(rng)
                        while ekey in keys:
                            ekey = rand_key(rng)
                        keys.add(ekey)
                    nq = rng.randint(1, 8)
                    rows = [
                        (rng.randint(0, 60), rng.randint(-1, 60),
                         rng.choice([0, 13, 37, 60, 255]),
                         rng.choice([-1, 0, 20, 50, 300]))
                        for _ in range(nq)
                    ]
                    events.append((ekey, rows))
                cases.append(dict(mode=mode, flags=flags, key=key,
                                  neq=neq, events=events))
    # fuzz sweep (round 2): deep pools, long keys, extreme quals (q0/q93),
    # many same-key events (repeat pileups)
    for _ in range(40):
        mode = rng.randint(0, 1)
        flags = rng.choice([0, 1, 3, 5, 7])
        key = rand_key(rng, 1, 12)
        nneq = rng.randint(0, 60)
        neq = [(rng.choice([0, 2, 20, 45, 93]),
                rng.choice([0, 13, 37, 60, 255]))
               for _ in range(nneq)]
        nev = rng.randint(0, 5)
        events = []
        keys = {key}
        for _e in range(nev):
            if rng.random() < 0.6:
                ekey = key
            else:
                ekey = rand_key(rng, 1, 12)
                while ekey in keys:
                    ekey = rand_key(rng, 1, 12)
                keys.add(ekey)
            nq = rng.randint(1, 25)
            rows = [(rng.choice([0, 2, 20, 45, 93]),
                     rng.choice([-1, 0, 2, 45, 93]),
                     rng.choice([0, 13, 37, 60, 255]),
                     rng.choice([-1, 0, 20, 50, 300, 2147483647]))
                    for _ in range(nq)]
            events.append((ekey, rows))
        cases.append(dict(mode=mode, flags=flags, key=key,
                          neq=neq, events=events))
    # fuzz sweep (round 3): event-pool extremes matching the fused sparse
    # attach — very deep single-event pools (max-depth-ranked columns),
    # empty non-event pools with many events, all-q0 and all-q93 walls,
    # maximal 16bp keys, MQ255-only pools
    for _ in range(40):
        mode = rng.randint(0, 1)
        flags = rng.choice([0, 1, 3, 5, 7])
        kind = rng.random()
        key = rand_key(rng, 12, 16) if kind < 0.3 else rand_key(rng, 1, 6)
        if kind < 0.5:
            neq = []
        else:
            neq = [(rng.choice([0, 93]), rng.choice([255, 60]))
                   for _ in range(rng.randint(0, 20))]
        nev = rng.randint(1, 6)
        events = []
        keys = {key}
        for _e in range(nev):
            if rng.random() < 0.7:
                ekey = key
            else:
                ekey = rand_key(rng, 1, 16)
                while ekey in keys:
                    ekey = rand_key(rng, 1, 16)
                keys.add(ekey)
            nq = rng.randint(30, 120) if rng.random() < 0.4 \
                else rng.randint(1, 10)
            wall = rng.random()
            if wall < 0.25:
                rows = [(0, 0, 255, -1) for _ in range(nq)]
            elif wall < 0.5:
                rows = [(93, 93, 60, 93) for _ in range(nq)]
            else:
                rows = [(rng.choice([0, 2, 20, 45, 93]),
                         rng.choice([-1, 0, 2, 45, 93]),
                         rng.choice([0, 13, 37, 60, 255]),
                         rng.choice([-1, 0, 20, 50, 300, 2147483647]))
                        for _ in range(nq)]
            events.append((ekey, rows))
        cases.append(dict(mode=mode, flags=flags, key=key,
                          neq=neq, events=events))
    return cases


def emit(case):
    parts = [str(case["mode"]), str(case["flags"]), case["key"],
             str(len(case["neq"]))]
    for iq, mq in case["neq"]:
        parts += [str(iq), str(mq)]
    parts.append(str(len(case["events"])))
    for ekey, rows in case["events"]:
        parts += [ekey, str(len(rows))]
        for iq, aq, mq, sq in rows:
            parts += [str(iq), str(aq), str(mq), str(sq)]
    return " ".join(parts)


def main():
    cases = gen_cases()
    if sys.argv[1] == "--emit-input":
        for c in cases:
            print(emit(c))
    elif sys.argv[1] == "--pack":
        golden = open(sys.argv[3]).read().splitlines()
        assert len(golden) == len(cases)
        out = []
        for c, g in zip(cases, golden):
            toks = g.split()
            out.append(dict(case=c, n=int(toks[0]), probs_hex=toks[1:]))
        with open(sys.argv[4], "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {sys.argv[4]} ({len(out)} cases)")


if __name__ == "__main__":
    main()
