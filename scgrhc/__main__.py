"""CLI entry point: ``python -m scgrhc <dir_name|all>`` runs the full
experiment pipeline, mirroring the reference's
``python waveform_pipeline.py <dir_name|all>`` (reference:
waveform_pipeline.py:31-40).  Subcommands expose the individual stages."""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: scgrhc <dir_name|all>            run full pipeline\n"
            "       scgrhc data <dir_name>           build segment store/loaders\n"
            "       scgrhc train <dir_name>          train WGAN-GP\n"
            "       scgrhc test <dir_name> <split> <ckpt|all|last>\n"
            "       scgrhc select <dir_name>         score/select checkpoints\n"
            "       scgrhc summary                   cohort statistics report\n"
            "       scgrhc predict <dir> <record> [ckpt|best|last] [--overlap S]\n"
            "                      [--mesh]\n"
            "       scgrhc serve <dir> [ckpt|best|last] [--calibrate] [--warm N]\n"
            "                    [--mesh] [--timeout S]\n"
            "                                        whole-record RHC synthesis\n"
            "       scgrhc sweep [root] [--jobs N] [--epochs E] [--seed S]\n"
            "                    [--train-mode step|epoch] [--fast]\n"
            "                    [--inproc|--subproc] [--prune]\n"
            "                                        generate+run waveform_06..37\n"
            "       scgrhc report [root]             ranked sweep results table\n"
            "       scgrhc plots <dir> <split> <ckpt|best> [n]\n"
            "                                        pred_top/pred_rand figures\n"
            "       scgrhc demo [dir] [--epochs N] [--records N] [--seconds S]\n"
            "                                        zero-setup synthetic E2E demo\n"
            "       scgrhc export <dir> <ckpt|best|last> [out]\n"
            "                                        torch.save file for reference tools\n"
            "       scgrhc export-loaders <dir> [out_dir]\n"
            "                                        genuine torch DataLoader pickles"
        )
        return 0
    import scgrhc
    from scgrhc.pipeline.run import dispatch

    # after argv parsing, before any stage compiles: the platform is
    # settled now, so the cache dir keys on the resolved backend.
    # EXCEPT `sweep`: resolving the backend instantiates the device
    # client, and a subprocess fan-out parent that holds the TPU blocks
    # every child on exclusive-access hosts — the sweep branch configures
    # the cache itself only when it compiles in-process (dispatch).
    if argv[0] != "sweep":
        scgrhc.configure_compilation_cache()
    return dispatch(argv)


if __name__ == "__main__":
    raise SystemExit(main())
