"""
Evaluate CLI: chunk-level accuracy report on training/validation data
(reference: bonito/cli/evaluate.py:70-137).
"""

import time
from argparse import ArgumentParser, ArgumentDefaultsHelpFormatter

import numpy as np

from bonito_tpu.data import load_numpy_datasets
from bonito_tpu.util import accuracy, decode_ref, init, load_model


def main(args):
    init(args.seed)

    print("* loading data")
    directory = args.directory
    chunks, targets, lengths = load_numpy_datasets(
        limit=args.chunks, directory=str(directory))

    print("* loading model", args.model_directory)
    model = load_model(args.model_directory, weights=args.weights, half=False)

    print("* calling")
    t0 = time.perf_counter()

    seqs = []
    accuracies = []
    for i in range(0, len(chunks), args.batchsize):
        data = np.asarray(chunks[i:i + args.batchsize], np.float32)
        if data.ndim == 2:
            data = data[..., None]
        scores = model.forward(data)
        batch_seqs = model.decode_batch(scores)
        for seq, target, n in zip(
                batch_seqs, targets[i:i + args.batchsize],
                lengths[i:i + args.batchsize]):
            ref = decode_ref(target[:n], model.alphabet)
            accuracies.append(
                accuracy(ref, seq, min_coverage=args.min_coverage)
                if len(seq) else 0.0)
            seqs.append(seq)

    duration = time.perf_counter() - t0

    print("* mean      %.2f%%" % np.mean(accuracies))
    print("* median    %.2f%%" % np.median(accuracies))
    print("* time      %.2f" % duration)
    print("* samples/s %.2E" % (len(chunks) * chunks.shape[1] / duration))


def argparser():
    parser = ArgumentParser(
        formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    parser.add_argument("model_directory")
    parser.add_argument("--directory", required=True)
    parser.add_argument("--seed", default=9, type=int)
    parser.add_argument("--weights", default=None, type=str)
    parser.add_argument("--chunks", default=1000, type=int)
    parser.add_argument("--batchsize", default=96, type=int)
    parser.add_argument("--beamsize", default=5, type=int)
    parser.add_argument("--min-coverage", default=0.5, type=float)
    return parser
