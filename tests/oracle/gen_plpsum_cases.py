#!/usr/bin/env python3
"""Random plp_summary columns: spec emitter + golden packer.

--emit-input  writes the oracle_plpsum.c stdin spec for random columns
--pack        merges the spec + oracle stdout into ../golden/plpsum.json
"""

import json
import random
import sys

NT = "ACGTN"


def gen_cases(rng):
    cases = []
    for conf in ((1, 1), (1, 0), (0, 1), (0, 0)):
        for _ in range(12):
            nts = {}
            for i in range(5):
                if rng.random() < 0.7:
                    n = rng.randrange(0, 6)
                    nts[i] = dict(
                        bq=[rng.randrange(0, 94) for _ in range(n)],
                        baq=[rng.randrange(-1, 94) for _ in range(n)],
                        mq=[rng.randrange(0, 256) for _ in range(n)],
                        sq=[rng.randrange(-1, 100) for _ in range(n)],
                    )

            def pool():
                n = rng.randrange(0, 5)
                return ([rng.randrange(0, 94) for _ in range(n)],
                        [rng.randrange(0, 61) for _ in range(n)])

            def events(keys):
                evs = []
                for k in rng.sample(keys, rng.randrange(0, 3)):
                    n = rng.randrange(1, 4)
                    evs.append(dict(
                        key=k,
                        q=[rng.randrange(0, 94) for _ in range(n)],
                        aq=[rng.randrange(-1, 94) for _ in range(n)],
                        mq=[rng.randrange(0, 256) for _ in range(n)],
                        sq=[rng.randrange(-1, 100) for _ in range(n)],
                    ))
                return evs

            cons = rng.choice(
                [rng.choice("ACGTN"), "+" + "".join(
                    rng.choice("ACGT") for _ in range(rng.randrange(1, 4))),
                 "-" + "".join(
                     rng.choice("ACGT") for _ in range(rng.randrange(1, 4)))])
            iq_pool, im_pool = pool()
            dq_pool, dm_pool = pool()
            cases.append(dict(
                conf=dict(use_baq=conf[0], use_sq=conf[1]),
                target=f"chr{rng.randrange(1, 23)}",
                pos=rng.randrange(0, 10_000_000),
                ref=rng.choice("ACGTN"),
                cons=cons,
                heads=rng.randrange(0, 10), tails=rng.randrange(0, 10),
                num_ins=rng.randrange(0, 5), num_dels=rng.randrange(0, 5),
                hrun=rng.randrange(1, 12),
                fw=[rng.randrange(0, 50) for _ in range(5)],
                rv=[rng.randrange(0, 50) for _ in range(5)],
                nts={str(k): v for k, v in nts.items()},
                ins_neq=dict(q=iq_pool, mq=im_pool),
                del_neq=dict(q=dq_pool, mq=dm_pool),
                ins_events=events(["A", "AG", "TTC", "C"]),
                del_events=events(["T", "GA", "CCG", "G"]),
            ))
    return cases


def emit_spec(cases, out):
    for c in cases:
        out.write(f"CONF {c['conf']['use_baq']} {c['conf']['use_sq']}\n")
        out.write(f"COL {c['target']} {c['pos']} {c['ref']} {c['cons']} "
                  f"{c['heads']} {c['tails']} {c['num_ins']} "
                  f"{c['num_dels']} {c['hrun']}\n")
        out.write("FW " + " ".join(map(str, c["fw"])) + "\n")
        out.write("RV " + " ".join(map(str, c["rv"])) + "\n")
        for i, d in c["nts"].items():
            n = len(d["bq"])
            out.write(f"NT {i} {n} " + " ".join(
                map(str, d["bq"] + d["baq"] + d["mq"] + d["sq"])) + "\n")
        out.write(f"INQ {len(c['ins_neq']['q'])} " +
                  " ".join(map(str, c["ins_neq"]["q"])) + "\n")
        out.write(f"INM {len(c['ins_neq']['mq'])} " +
                  " ".join(map(str, c["ins_neq"]["mq"])) + "\n")
        out.write(f"DNQ {len(c['del_neq']['q'])} " +
                  " ".join(map(str, c["del_neq"]["q"])) + "\n")
        out.write(f"DNM {len(c['del_neq']['mq'])} " +
                  " ".join(map(str, c["del_neq"]["mq"])) + "\n")
        for tag, evs in (("IEV", c["ins_events"]), ("DEV", c["del_events"])):
            for e in evs:
                n = len(e["q"])
                out.write(f"{tag} {e['key']} {n} " + " ".join(
                    map(str, e["q"] + e["aq"] + e["mq"] + e["sq"])) + "\n")
        out.write("ENDCOL\n")


def main():
    rng = random.Random(20260817)
    cases = gen_cases(rng)
    if sys.argv[1] == "--emit-input":
        emit_spec(cases, sys.stdout)
    elif sys.argv[1] == "--pack":
        golden = open(sys.argv[3]).read()
        blocks = golden.split("\n\n")
        if blocks and blocks[-1] == "":
            blocks = blocks[:-1]
        assert len(blocks) == len(cases), (len(blocks), len(cases))
        out = [dict(case=c, text=b + "\n\n") for c, b in zip(cases, blocks)]
        with open(sys.argv[4], "w") as fh:
            json.dump(out, fh, indent=1)
    else:
        raise SystemExit("--emit-input or --pack")


if __name__ == "__main__":
    main()
