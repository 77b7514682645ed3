"""Dataset preprocessing CLI: raw -> interim -> processed.

Covers the reference's standalone builder scripts
(``vqa/datasets/{vqa_interim,vqa2_interim,vqa_processed,vgenome_interim,
vgenome_processed}.py`` __main__ blocks) as subcommands.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_int = sub.add_parser("interim", help="flatten official VQA jsons")
    p_int.add_argument("--dir_vqa", default="data/vqa2", type=str)
    p_int.add_argument("--version", type=int, default=2, choices=[1, 2])

    p_proc = sub.add_parser("processed", help="vocabs + encodings")
    p_proc.add_argument("--dirname", default="data/vqa2", type=str)
    p_proc.add_argument("--trainsplit", default="train",
                        choices=["train", "trainval"])
    p_proc.add_argument("--nans", default=2000, type=int)
    p_proc.add_argument("--maxlength", default=26, type=int)
    p_proc.add_argument("--minwcount", default=0, type=int)
    p_proc.add_argument("--nlp", default="mcb",
                        choices=["mcb", "nltk", "naive"])
    p_proc.add_argument("--pad", default="left", choices=["left", "right"])

    p_vg = sub.add_parser("vgenome-interim", help="Visual Genome QA rows")
    p_vg.add_argument("--dir_vg", default="data/vgenome", type=str)

    p_dl = sub.add_parser("download", help="fetch raw artifacts (needs net)")
    p_dl.add_argument("--what", required=True,
                      choices=["vqa2", "knn", "coco", "vgenome"])
    p_dl.add_argument("--dir_raw", required=True, type=str)

    args = parser.parse_args(argv)
    from ..data import factory as data_factory
    from ..data import interim as interim_mod
    from ..data import processed as processed_mod

    if args.cmd == "interim":
        interim_mod.vqa_interim(args.dir_vqa, version=args.version)
    elif args.cmd == "processed":
        paths = processed_mod.vqa_processed({
            "dir": args.dirname, "trainsplit": args.trainsplit,
            "nans": args.nans, "maxlength": args.maxlength,
            "minwcount": args.minwcount, "nlp": args.nlp, "pad": args.pad})
        print("Wrote:", "\n  ".join(sorted(paths.values())))
    elif args.cmd == "vgenome-interim":
        interim_mod.vgenome_interim(args.dir_vg)
    elif args.cmd == "download":
        urls = {"vqa2": data_factory.VQA2_URLS,
                "knn": data_factory.KNN_URLS,
                "coco": data_factory.COCO_URLS,
                "vgenome": data_factory.VGENOME_URLS}[args.what]
        ok = data_factory.download_raw(args.dir_raw, urls)
        print("download", "complete" if ok else "FAILED (no egress?)")


if __name__ == "__main__":
    main()
