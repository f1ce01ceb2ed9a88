"""
Format-agnostic signal reading: directory probing, the Read record type,
signal trim and normalisation.

Trim heuristic and quantile/pa normalisation are bit-compatible with the
reference (bonito/reader.py:122-166) — these feed directly into basecall
output so their arithmetic must match exactly.
"""

import sys
from glob import iglob
from collections import OrderedDict
from importlib import import_module

import numpy as np

__formats__ = ["pod5", "fast5"]

# kit-14 DNA quantile normalisation defaults (reference: bonito/reader.py:18-21)
__default_norm_params__ = {
    "quantile_a": 0.2,
    "quantile_b": 0.9,
    "shift_multiplier": 0.51,
    "scale_multiplier": 0.53,
}


class Reader:
    """Probe a directory for pod5/fast5 and dispatch to the backend."""

    def __init__(self, directory, recursive=False):
        self.fmt = None
        for fmt in __formats__:
            pattern = f"**/*.{fmt}" if recursive else f"*.{fmt}"
            match = next(iglob(str(directory) + "/" + pattern, recursive=True), None)
            if match is not None:
                self.fmt = fmt
                break
        else:
            raise FileNotFoundError(
                f"no pod5/fast5 files found in {directory}")
        if self.fmt == "fast5":
            sys.stderr.write(
                "DeprecationWarning: fast5 support will be deprecated; "
                "please use pod5\n")
        backend = import_module(f"bonito_tpu.{self.fmt}")
        self._get_reads = backend.get_reads
        self._get_read_groups = backend.get_read_groups

    def get_reads(self, *args, **kwargs):
        return self._get_reads(*args, **kwargs)

    def get_read_groups(self, *args, **kwargs):
        return self._get_read_groups(*args, **kwargs)


class Read:
    """Base read record; backends fill the attributes."""

    read_id = None
    run_id = ""
    filename = ""
    sample_id = "unset"
    exp_start_time = ""
    flow_cell_id = ""
    device_id = ""
    mux = 0
    channel = 0
    read_number = 0
    start = 0.0
    duration = 0.0
    start_time = ""
    sample_rate = 1
    shift = 0.0
    scale = 1.0
    scaling_strategy = "quantile"
    trimmed_samples = 0
    num_samples = 0
    signal = None

    def __repr__(self):
        return "Read('%s')" % self.read_id

    def readgroup(self, model):
        """@RG header line (reference: bonito/reader.py:59-73)."""
        self._groupdict = OrderedDict([
            ("ID", f"{self.run_id}_{model}"),
            ("PL", "ONT"),
            ("DT", f"{self.exp_start_time}"),
            ("PU", f"{self.flow_cell_id}"),
            ("PM", f"{self.device_id}"),
            ("LB", f"{self.sample_id}"),
            ("SM", f"{self.sample_id}"),
            ("DS", "%s" % " ".join([
                f"run_id={self.run_id}",
                f"basecall_model={model}",
            ])),
        ])
        return "\t".join(
            ["@RG", *[f"{k}:{v}" for k, v in self._groupdict.items()]])

    def tagdata(self):
        """Per-read SAM tags (reference: bonito/reader.py:75-86)."""
        return [
            f"mx:i:{self.mux}",
            f"ch:i:{self.channel}",
            f"st:Z:{self.start_time}",
            f"du:f:{self.duration}",
            f"rn:i:{self.read_number}",
            f"f5:Z:{self.filename}",
            f"sm:f:{self.shift}",
            f"sd:f:{self.scale}",
            f"sv:Z:{self.scaling_strategy}",
        ]


class ReadChunk:
    """Fixed-size slice of a read for --save-ctc (reference: reader.py:89-104)."""

    def __init__(self, read, chunk, i, n):
        self.read_id = "%s:%i:%i" % (read.read_id, i, n)
        self.run_id = read.run_id
        self.filename = read.filename
        self.mux = read.mux
        self.channel = read.channel
        self.start = read.start
        self.duration = read.duration
        self.template_start = self.start
        self.template_duration = self.duration
        self.signal = chunk

    def __repr__(self):
        return "ReadChunk('%s')" % self.read_id


def read_chunks(read, chunksize=4000, overlap=400):
    """Split a read into fixed-size chunks (reference: reader.py:107-119)."""
    if len(read.signal) < chunksize:
        return
    _, offset = divmod(len(read.signal) - chunksize, chunksize - overlap)
    signal = read.signal[offset:]
    step = chunksize - overlap
    n = (len(signal) - chunksize) // step + 1
    for i in range(n):
        yield ReadChunk(read, signal[i * step:i * step + chunksize], i + 1, n)


def trim(signal, window_size=40, threshold=2.4, min_trim=10, min_elements=3,
         max_samples=8000, max_trim=0.3):
    """Signal-start trim heuristic (bit-identical to bonito/reader.py:122-139)."""
    seen_peak = False
    num_windows = min(max_samples, len(signal)) // window_size

    for pos in range(num_windows):
        start = pos * window_size + min_trim
        end = start + window_size
        window = signal[start:end]
        if len(window[window > threshold]) > min_elements or seen_peak:
            seen_peak = True
            if window[-1] > threshold:
                continue
            if end >= min(max_samples, len(signal)) or end / len(signal) > max_trim:
                return min_trim
            return end

    return min_trim


def normalisation(sig, scaling_strategy=None, norm_params=None):
    """(shift, scale) for signal standardisation (bonito/reader.py:142-166)."""
    if scaling_strategy and scaling_strategy.get("strategy") == "pa":
        if norm_params and norm_params.get("standardise") == 1:
            shift = norm_params.get("mean")
            scale = norm_params.get("stdev")
        elif norm_params and norm_params.get("standardise") == 0:
            shift = 0.0
            scale = 1.0
        else:
            raise ValueError(
                "Picoampere scaling requested, but standardisation flag "
                "not provided")
    elif scaling_strategy is None or scaling_strategy.get("strategy") == "quantile":
        if norm_params is None:
            norm_params = __default_norm_params__
        qa, qb = np.quantile(
            sig, [norm_params["quantile_a"], norm_params["quantile_b"]])
        shift = max(10, norm_params["shift_multiplier"] * (qa + qb))
        scale = max(1.0, norm_params["scale_multiplier"] * (qb - qa))
    else:
        raise ValueError(
            f"Scaling strategy {scaling_strategy.get('strategy')} not "
            "supported; choose quantile or pa.")
    return shift, scale


def apply_standardisation(read, scaled, scaling_strategy=None,
                          norm_params=None, do_trim=True):
    """Common tail of every backend's Read init: normalise + trim + slice."""
    read.scaling_strategy = (
        "quantile" if scaling_strategy is None
        else scaling_strategy.get("strategy", "quantile"))
    read.shift, read.scale = normalisation(scaled, scaling_strategy, norm_params)
    read.trimmed_samples = (
        trim(scaled, threshold=read.scale * 2.4 + read.shift) if do_trim else 0)
    read.template_start = read.start + read.trimmed_samples / read.sample_rate
    read.template_duration = (
        read.duration - read.trimmed_samples / read.sample_rate)
    read.signal = (scaled[read.trimmed_samples:] - read.shift) / read.scale
    read.num_samples = len(scaled)
    return read
