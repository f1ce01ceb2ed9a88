"""
POD5 read backend.

POD5 is an Apache-Arrow container: one file embedding three Arrow IPC
files (reads table, signal table, run-info table) between a signature and
a flatbuffer footer. This environment has no `pod5` package, so this
module parses the container directly with pyarrow: embedded Arrow files
are located by their ARROW1 framing magic (start magic is
"ARROW1\\x00\\x00", end magic "ARROW1") and identified by schema fields —
no footer parsing needed. Signal chunks use VBZ compression
(zstd over svb16 delta-zigzag; svb16 is our native codec, native/vbz).

Read semantics match the reference backend (bonito/pod5.py:18-124):
pA scale = calibration_scale * (adc + calibration_offset), then
quantile/pa standardisation and trim.

A writer (`write_pod5`) emits the same layout for fixtures and for
`bonito_tpu export`-style dataset repacking, including a spec-conformant
flatbuffer footer index (table offsets/lengths/content types) that this
module's reader — and third-party pod5 tooling — resolves tables from;
the framing-magic scan remains as a fallback for footerless files.
"""

import ctypes
import sys
from functools import partial
import uuid
from datetime import datetime, timedelta, timezone
from glob import glob
from pathlib import Path

import numpy as np

from bonito_tpu import native
from bonito_tpu.reader import Read as BaseRead
from bonito_tpu.signal import apply_standardisation

_SIGNATURE = b"\x8bPOD\r\n\x1a\n"
_ARROW_START = b"ARROW1\x00\x00"
_ARROW_MAGIC = b"ARROW1"


# ---------------------------------------------------------------------------
# vbz signal codec (zstd over native svb16 delta-zigzag)
# ---------------------------------------------------------------------------

def vbz_compress(signal):
    import zstandard
    signal = np.ascontiguousarray(signal, np.int16)
    lib = native.load("vbz")
    n = len(signal)
    if lib is not None:
        buf = ctypes.create_string_buffer(lib.svb16_max_encoded_size(n))
        written = lib.svb16_encode_dz(
            signal.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n,
            ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)))
        payload = buf.raw[:written]
    else:
        payload = _svb16_encode_py(signal)
    return zstandard.ZstdCompressor(level=1).compress(payload)


def vbz_decompress(data, sample_count):
    import zstandard
    payload = zstandard.ZstdDecompressor().decompress(
        data, max_output_size=(sample_count + 7) // 8 + 2 * sample_count)
    lib = native.load("vbz")
    out = np.empty(sample_count, np.int16)
    if lib is not None:
        rc = lib.svb16_decode_dz(
            ctypes.cast(ctypes.c_char_p(payload),
                        ctypes.POINTER(ctypes.c_uint8)),
            len(payload),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            sample_count)
        if rc != 0:
            raise ValueError("corrupt vbz signal chunk")
        return out
    return _svb16_decode_py(payload, sample_count)


def _svb16_encode_py(signal):
    # deltas wrap in int16 and the zigzag is 16-bit, matching the native
    # codec (native/vbz/vbz.cpp) — a 64-bit zigzag truncated to uint16
    # silently corrupts any |delta| > 32767 and every sample after it
    with np.errstate(over="ignore"):
        deltas = np.diff(np.concatenate(
            [np.int16([0]), signal.astype(np.int16)]).astype(np.int16))
    zz = (((deltas.astype(np.int16) << 1) ^ (deltas >> 15))
          .astype(np.uint16))
    n = len(zz)
    keys = np.zeros((n + 7) // 8, np.uint8)
    data = bytearray()
    for i, v in enumerate(zz):
        data.append(v & 0xFF)
        if v > 0xFF:
            data.append(v >> 8)
            keys[i // 8] |= 1 << (i % 8)
    return keys.tobytes() + bytes(data)


def _svb16_decode_py(payload, count):
    key_bytes = (count + 7) // 8
    keys = np.frombuffer(payload[:key_bytes], np.uint8)
    data = payload[key_bytes:]
    out = np.empty(count, np.int16)
    pos = 0
    prev = 0
    for i in range(count):
        if keys[i // 8] & (1 << (i % 8)):
            zz = data[pos] | (data[pos + 1] << 8)
            pos += 2
        else:
            zz = data[pos]
            pos += 1
        delta = (zz >> 1) ^ -(zz & 1)
        # two's-complement int16 wraparound in plain python ints (the
        # np.int16 cast warns on overflow under NEP 50)
        prev = ((int(prev) + delta + 0x8000) & 0xFFFF) - 0x8000
        out[i] = prev
    return out


# ---------------------------------------------------------------------------
# flatbuffer footer (pod5 footer.fbs: table Footer { file_identifier,
# software, pod5_version, contents: [EmbeddedFile] }; table EmbeddedFile
# { offset, length, format, content_type }). Field ids follow schema
# order; Format.FeatherV2 = 0; ContentType ReadsTable=0 SignalTable=1
# RunInfoTable=4.
# ---------------------------------------------------------------------------

CONTENT_READS, CONTENT_SIGNAL, CONTENT_RUN_INFO = 0, 1, 4


def build_footer(contents, file_identifier, software="bonito_tpu",
                 pod5_version="0.3.10"):
    """Serialise the footer flatbuffer. ``contents`` is a list of dicts
    with offset/length/content_type (format is always FeatherV2 = 0)."""
    import flatbuffers
    b = flatbuffers.Builder(1024)
    fid = b.CreateString(file_identifier)
    sw = b.CreateString(software)
    ver = b.CreateString(pod5_version)

    efs = []
    for c in contents:
        b.StartObject(4)
        b.PrependInt64Slot(0, c["offset"], 0)
        b.PrependInt64Slot(1, c["length"], 0)
        b.PrependInt16Slot(2, c.get("format", 0), 0)
        b.PrependInt16Slot(3, c["content_type"], 0)
        efs.append(b.EndObject())

    b.StartVector(4, len(efs), 4)
    for o in reversed(efs):
        b.PrependUOffsetTRelative(o)
    vec = b.EndVector()

    b.StartObject(4)
    b.PrependUOffsetTRelativeSlot(0, fid, 0)
    b.PrependUOffsetTRelativeSlot(1, sw, 0)
    b.PrependUOffsetTRelativeSlot(2, ver, 0)
    b.PrependUOffsetTRelativeSlot(3, vec, 0)
    b.Finish(b.EndObject())
    return bytes(b.Output())


def parse_footer(data):
    """Parse the footer flatbuffer out of a pod5 byte string. The footer
    sits before the trailing <int64 length><section marker><signature>.
    Returns {file_identifier, software, pod5_version, contents: [...]} or
    None when the footer is absent/empty (legacy placeholder files)."""
    import flatbuffers
    from flatbuffers import number_types as NT

    tail = len(data) - len(_SIGNATURE) - 16          # before marker+signature
    flen_off = tail - 8
    if flen_off <= 0:
        return None
    flen = int.from_bytes(data[flen_off:tail], "little", signed=True)
    if flen <= 0 or flen > flen_off:
        return None
    buf = bytearray(data[flen_off - flen:flen_off])

    t = flatbuffers.table.Table(buf, 0)
    root = t.Get(NT.UOffsetTFlags, 0)
    root_t = flatbuffers.table.Table(buf, root)

    def string_field(tab, slot):
        o = tab.Offset(4 + 2 * slot)
        return tab.String(o + tab.Pos).decode() if o else None

    out = {
        "file_identifier": string_field(root_t, 0),
        "software": string_field(root_t, 1),
        "pod5_version": string_field(root_t, 2),
        "contents": [],
    }
    o = root_t.Offset(4 + 2 * 3)
    if o:
        n = root_t.VectorLen(o)
        vec = root_t.Vector(o)
        for i in range(n):
            pos = vec + i * 4
            ef = flatbuffers.table.Table(
                buf, pos + root_t.Get(NT.UOffsetTFlags, pos))

            def scalar(tab, slot, flags, default=0):
                off = tab.Offset(4 + 2 * slot)
                return tab.Get(flags, off + tab.Pos) if off else default

            out["contents"].append({
                "offset": scalar(ef, 0, NT.Int64Flags),
                "length": scalar(ef, 1, NT.Int64Flags),
                "format": scalar(ef, 2, NT.Int16Flags),
                "content_type": scalar(ef, 3, NT.Int16Flags),
            })
    return out


# ---------------------------------------------------------------------------
# container parsing
# ---------------------------------------------------------------------------

def _embedded_arrow_tables(path):
    """Locate + open every embedded Arrow IPC file; returns list of
    pyarrow Tables. Prefers the flatbuffer footer index; falls back to an
    ARROW1 framing-magic scan for files without one."""
    import pyarrow as pa
    import pyarrow.ipc

    data = Path(path).read_bytes()
    if not data.startswith(_SIGNATURE):
        raise ValueError(f"{path} is not a pod5 file (bad signature)")

    try:
        footer = parse_footer(data)
    except Exception:
        footer = None
    if footer and footer["contents"]:
        mv = memoryview(data)
        tables = []
        for ef in footer["contents"]:
            sl = mv[ef["offset"]:ef["offset"] + ef["length"]]
            reader = pa.ipc.open_file(pa.BufferReader(pa.py_buffer(sl)))
            tables.append(reader.read_all())
        return tables

    tables = []
    mv = memoryview(data)
    pos = 0
    while True:
        start = data.find(_ARROW_START, pos)
        if start < 0:
            break
        # candidate end = each subsequent ARROW1; an Arrow file ends with
        # <int32 footer_size><"ARROW1">, and padding can make an end magic
        # look like a start magic, so validate each candidate by checking
        # the footer-size field and trying to open the slice.
        scan = start + len(_ARROW_START)
        end = -1
        table = None
        while True:
            cand = data.find(_ARROW_MAGIC, scan)
            if cand < 0:
                break
            scan = cand + len(_ARROW_MAGIC)
            cand_end = cand + len(_ARROW_MAGIC)
            fsz_off = cand - 4
            if fsz_off <= start:
                continue
            footer_size = int.from_bytes(data[fsz_off:cand], "little")
            if footer_size <= 0 or fsz_off - footer_size < start:
                continue
            try:
                reader = pa.ipc.open_file(
                    pa.BufferReader(pa.py_buffer(mv[start:cand_end])))
                table = reader.read_all()
                end = cand_end
                break
            except pa.lib.ArrowInvalid:
                continue
        if end < 0:
            pos = start + len(_ARROW_START)
            continue
        tables.append(table)
        pos = end
    return tables


def _classify(tables):
    reads = signal = run_info = None
    for t in tables:
        names = set(t.schema.names)
        if "samples" in names and "signal" in names:
            signal = t
        elif "calibration_offset" in names or (
                "signal" in names and "read_number" in names):
            reads = t
        elif "acquisition_id" in names or "sample_rate" in names:
            run_info = t
    return reads, signal, run_info


class Pod5File:
    """Parsed pod5: per-read signal assembly + metadata lookups."""

    def __init__(self, path):
        self.path = Path(path)
        reads, signal, run_info = _classify(_embedded_arrow_tables(path))
        if reads is None or signal is None:
            raise ValueError(f"{path}: missing reads/signal table")
        self.reads = reads
        self.signal = signal
        self.run_info = run_info
        # the signal-row index materialises two whole columns; metadata
        # passes (get_read_groups' @RG scan) never touch signal, so it
        # builds lazily on first get_signal
        self._sig_rows = None
        self._samples = None
        self._sig_col = self.signal.column("signal")
        # positive detection: vbz chunks are stored as (large_)binary;
        # any list-of-int16 layout is uncompressed (a negative
        # startswith("large_list") check misread plain list<int16> as
        # compressed and fed raw samples to zstd)
        sig_type = str(self._sig_col.type)
        self._compressed = "binary" in sig_type
        self._run_info_cache = {}

    def read_ids(self):
        return [str(uuid.UUID(bytes=bytes(b)))
                for b in self.reads.column("read_id").to_pylist()]

    def num_reads(self):
        return self.reads.num_rows

    def _ensure_sig_index(self):
        if self._sig_rows is None:
            sig_ids = self.signal.column("read_id").to_pylist()
            self._sig_rows = {}
            for i, rid in enumerate(sig_ids):
                self._sig_rows.setdefault(bytes(rid), []).append(i)
            self._samples = self.signal.column("samples").to_pylist()

    def get_signal(self, read_id_bytes):
        self._ensure_sig_index()
        rows = self._sig_rows.get(read_id_bytes, [])
        parts = []
        for r in rows:
            n = self._samples[r]
            chunk = self._sig_col[r].as_py()
            if self._compressed:
                parts.append(vbz_decompress(bytes(chunk), n))
            else:
                parts.append(np.asarray(chunk, np.int16))
        return (np.concatenate(parts) if parts
                else np.empty(0, np.int16))

    def run_info_row(self, key):
        """Run-info row by integer index or acquisition id (real pod5
        files dictionary-encode the reads table's run_info column as the
        acquisition_id string)."""
        if self.run_info is None or key is None:
            return {}
        if key in self._run_info_cache:
            return self._run_info_cache[key]
        orig_key = key
        if isinstance(key, str):
            if "acquisition_id" not in self.run_info.schema.names:
                return {}
            ids = self.run_info.column("acquisition_id").to_pylist()
            try:
                key = ids.index(key)
            except ValueError:
                self._run_info_cache[orig_key] = {}
                return {}
        if key >= self.run_info.num_rows:
            return {}
        row = {name: self.run_info.column(name)[key].as_py()
               for name in self.run_info.schema.names}
        # cache per acquisition id / index: get_read_groups resolves one
        # of O(num_runs) rows for EVERY read, and the column
        # rematerialisation was O(num_reads * num_runs)
        self._run_info_cache[orig_key] = row
        return row

    def _col(self, name, row, default=None):
        if name in self.reads.schema.names:
            v = self.reads.column(name)[row].as_py()
            return v if v is not None else default
        return default


class Read(BaseRead):

    def __init__(self, p5: Pod5File, row: int, filename, meta=False,
                 do_trim=True, scaling_strategy=None, norm_params=None):
        rid = bytes(p5.reads.column("read_id")[row].as_py())
        self.read_id = str(uuid.UUID(bytes=rid))
        self.filename = Path(filename).name

        info = p5.run_info_row(p5._col("run_info", row))
        self.run_id = info.get("acquisition_id", "") or ""
        self.sample_id = info.get("sample_id", "unset") or "unset"
        self.flow_cell_id = info.get("flow_cell_id", "") or ""
        self.device_id = info.get("system_name", "") or ""
        start_time = info.get("acquisition_start_time")
        if isinstance(start_time, datetime):
            self.exp_start_time = start_time.astimezone(
                timezone.utc).isoformat(timespec="milliseconds")
        else:
            self.exp_start_time = str(start_time or "")
        self.sample_rate = info.get("sample_rate", 5000) or 5000

        if meta:
            return

        self.mux = p5._col("well", row, 0)
        self.channel = p5._col("channel", row, 0)
        self.read_number = p5._col("read_number", row, 0)
        offset = p5._col("calibration_offset", row, 0.0)
        scale = p5._col("calibration_scale", row, 1.0)

        start_sample = p5._col("start", row, 0)
        self.start = start_sample / self.sample_rate

        raw = p5.get_signal(rid)
        self.duration = len(raw) / self.sample_rate
        scaled = np.array(scale * (raw + offset), dtype=np.float32)
        if self.exp_start_time:
            # per-read start = acquisition start + start_sample/rate,
            # like the reference (bonito/pod5.py:48-50) and the fast5
            # backend here — not the bare acquisition time
            from bonito_tpu.fast5 import _parse_time
            try:
                start_dt = (_parse_time(self.exp_start_time.replace("Z", ""))
                            + timedelta(seconds=float(self.start)))
                if start_dt.tzinfo is None:
                    start_dt = start_dt.replace(tzinfo=timezone.utc)
                self.start_time = start_dt.astimezone(
                    timezone.utc).isoformat(timespec="milliseconds")
            except (ValueError, TypeError):
                self.start_time = self.exp_start_time
        apply_standardisation(self, scaled, scaling_strategy, norm_params,
                              do_trim=do_trim)



def _num_reads_fast(path):
    """Reads-table row count WITHOUT loading the signal data: resolve the
    footer from the file tail and open only the (small) reads table.
    Falls back to a full parse for footerless files. Used by the reader's
    feeder thread, which previously paid a whole-file read+parse per file
    just to size the work items."""
    import pyarrow as pa
    import pyarrow.ipc

    p = Path(path)
    size = p.stat().st_size
    with open(p, "rb") as f:
        if f.read(len(_SIGNATURE)) != _SIGNATURE:
            raise ValueError(f"{path} is not a pod5 file (bad signature)")
        tail_len = min(size, 1 << 16)
        f.seek(size - tail_len)
        tail = f.read(tail_len)
        try:
            footer = parse_footer(tail)   # suffix-safe: indexes from the end
        except Exception:
            footer = None
        if footer and footer["contents"]:
            for ef in footer["contents"]:
                if ef["content_type"] == CONTENT_READS:
                    f.seek(ef["offset"])
                    buf = f.read(ef["length"])
                    reader = pa.ipc.open_file(pa.BufferReader(buf))
                    return sum(reader.get_batch(i).num_rows
                               for i in range(reader.num_record_batches))
    return Pod5File(path).num_reads()


def _files(directory, recursive=False):
    pattern = "**/*.pod5" if recursive else "*.pod5"
    return sorted(glob(str(Path(directory) / pattern), recursive=recursive))


def get_read_groups(directory, model, read_ids=None, skip=False, n_proc=1,
                    recursive=False, cancel=None):
    """Unique @RG lines plus the total read count (the reference's
    pod5 counterpart returns both, bonito/pod5.py:84-110; the count is
    over all reads in the files, pre-filter, as there)."""
    groups = set()
    num_reads = 0
    for filename in _files(directory, recursive):
        try:
            p5 = Pod5File(filename)
        except Exception as e:
            sys.stderr.write(f"> warning: {filename} - {e}\n")
            continue
        num_reads += p5.num_reads()
        for row in range(p5.num_reads()):
            read = Read(p5, row, filename, meta=True)
            if read_ids is None or (read.read_id in read_ids) ^ skip:
                groups.add(read.readgroup(model))
    return sorted(groups), num_reads


# one parsed Pod5File per worker process (work items are small row
# blocks of one file at a time, so a single slot is enough)
_P5_CACHE = {}


def _p5_cached(filename):
    if filename not in _P5_CACHE:
        _P5_CACHE.clear()
        _P5_CACHE[filename] = Pod5File(filename)
    return _P5_CACHE[filename]


def _read_block(item, read_ids=None, skip=False, do_trim=True,
                scaling_strategy=None, norm_params=None):
    """Worker: parse a (filename, row-range-or-None) item into a list of
    Read objects (plain attrs + numpy signal, picklable across the
    process boundary). Blocks keep one work item ~8 reads so the first
    batch doesn't wait on a whole-file blob through the queue; the
    shared config is bound once per worker via functools.partial."""
    filename, rows = item
    out = []
    try:
        p5 = _p5_cached(filename)
    except Exception as e:
        sys.stderr.write(f"> warning: {filename} - {e}\n")
        return out
    row_range = (range(*rows) if rows is not None
                 else range(p5.num_reads()))
    for row in row_range:
        rid = str(uuid.UUID(bytes=bytes(
            p5.reads.column("read_id")[row].as_py())))
        if not (read_ids is None or (rid in read_ids) ^ skip):
            continue
        try:
            out.append(Read(p5, row, filename, do_trim=do_trim,
                            scaling_strategy=scaling_strategy,
                            norm_params=norm_params))
        except Exception as e:
            sys.stderr.write(f"> warning: {filename} {rid} - {e}\n")
    return out


def get_reads(directory, read_ids=None, skip=False, max_read_size=0,
              n_proc=1, recursive=False, cancel=None, do_trim=True,
              scaling_strategy=None, norm_params=None):
    """Stream reads; files are parsed (signal decompression + trim +
    normalisation) in ``n_proc`` worker processes — the per-host sharded
    prefetcher shape from SURVEY.md §7."""
    from bonito_tpu.pipeline import process_map

    files = _files(directory, recursive)

    from bonito_tpu.fast5 import READ_BLOCK

    def blocks(block=READ_BLOCK):
        """(filename, row-range) work items of ~``block`` reads each, so
        the first reads reach the pipeline after one small block rather
        than after a whole file (a 250-read file is a ~100 MB queue
        blob). Row counts come from a lazy metadata open in the feeder
        thread; workers cache the parsed file (_p5_cached). The shared
        config (incl. a possibly-large --read-ids set) is bound into the
        worker fn ONCE via partial — embedding it in every ~8-read item
        re-pickled it through the queue thousands of times."""
        for f in files:
            try:
                n = _num_reads_fast(f)
            except Exception as e:
                sys.stderr.write(f"> warning: {f} - {e}\n")
                continue
            for lo in range(0, n, block):
                yield (f, (lo, min(lo + block, n)))

    worker = partial(_read_block, read_ids=read_ids, skip=skip,
                     do_trim=do_trim, scaling_strategy=scaling_strategy,
                     norm_params=norm_params)
    if n_proc <= 1:
        batches = ((None, worker((f, None))) for f in files)
    else:
        # blocks (not whole files) even when there is a single file:
        # row-range items let every worker contribute to it
        batches = process_map(
            worker, ((i, a) for i, a in enumerate(blocks())),
            n_proc=n_proc, maxsize=4)

    try:
        for _, reads in batches:
            for read in reads:
                if max_read_size > 0 and len(read.signal) > max_read_size:
                    sys.stderr.write(
                        f"> skipping long read {read.read_id} "
                        f"({len(read.signal)} samples)\n")
                    continue
                yield read
                if cancel is not None and cancel.is_set():
                    return
    finally:
        # the in-process (n_proc<=1) path parses through _p5_cached too;
        # without this the LAST file's whole byte buffer + Arrow tables
        # stay pinned in a long-lived process after streaming ends
        _P5_CACHE.clear()


# ---------------------------------------------------------------------------
# writer (fixtures + dataset repacking)
# ---------------------------------------------------------------------------

def write_pod5(path, reads, run_info=None, compress=True):
    """
    Write a pod5 file. ``reads`` is an iterable of dicts with keys:
    read_id (uuid str), signal (int16 array), and optionally channel, well,
    read_number, start, calibration_offset, calibration_scale.
    """
    import pyarrow as pa
    import pyarrow.ipc

    run_info = {**{
        "acquisition_id": "run0",
        "sample_id": "sample",
        "flow_cell_id": "FC000",
        "system_name": "sim",
        "sample_rate": 5000,
        "acquisition_start_time": datetime(2026, 1, 1, tzinfo=timezone.utc),
    }, **(run_info or {})}

    reads = list(reads)
    rid_bytes = [uuid.UUID(r["read_id"]).bytes for r in reads]

    sig_ids, sig_chunks, sig_samples = [], [], []
    for r, rb in zip(reads, rid_bytes):
        signal = np.ascontiguousarray(r["signal"], np.int16)
        sig_ids.append(rb)
        sig_samples.append(len(signal))
        sig_chunks.append(
            vbz_compress(signal) if compress else signal.tolist())

    fbin = pa.binary(16)
    if compress:
        signal_table = pa.table({
            "read_id": pa.array(sig_ids, fbin),
            "signal": pa.array(sig_chunks, pa.large_binary()),
            "samples": pa.array(sig_samples, pa.uint32()),
        })
    else:
        signal_table = pa.table({
            "read_id": pa.array(sig_ids, fbin),
            "signal": pa.array(sig_chunks, pa.large_list(pa.int16())),
            "samples": pa.array(sig_samples, pa.uint32()),
        })

    reads_table = pa.table({
        "read_id": pa.array(rid_bytes, fbin),
        "read_number": pa.array(
            [r.get("read_number", i) for i, r in enumerate(reads)], pa.uint32()),
        "channel": pa.array(
            [r.get("channel", 1) for r in reads], pa.uint16()),
        "well": pa.array([r.get("well", 1) for r in reads], pa.uint8()),
        "start": pa.array([r.get("start", 0) for r in reads], pa.uint64()),
        "calibration_offset": pa.array(
            [r.get("calibration_offset", 0.0) for r in reads], pa.float32()),
        "calibration_scale": pa.array(
            [r.get("calibration_scale", 1.0) for r in reads], pa.float32()),
        "run_info": pa.array([0 for _ in reads], pa.int16()),
    })

    run_info_table = pa.table({
        k: pa.array([v],
                    pa.timestamp("ms", tz="UTC")
                    if isinstance(v, datetime) else None)
        for k, v in run_info.items()
    })

    def arrow_file_bytes(table):
        import io
        sink = io.BytesIO()
        with pa.ipc.new_file(sink, table.schema) as w:
            w.write_table(table)
        return sink.getvalue()

    file_id = uuid.uuid4()
    section = file_id.bytes
    content_types = (CONTENT_READS, CONTENT_SIGNAL, CONTENT_RUN_INFO)
    with open(path, "wb") as f:
        f.write(_SIGNATURE)
        f.write(section)
        contents = []
        for table, ctype in zip(
                (reads_table, signal_table, run_info_table), content_types):
            payload = arrow_file_bytes(table)
            contents.append({
                "offset": f.tell(), "length": len(payload),
                "content_type": ctype,
            })
            f.write(payload)
            f.write(b"\x00" * (-len(payload) % 8))
        # footer index: <flatbuffer><int64 length><section marker><signature>
        footer = build_footer(contents, file_identifier=str(file_id))
        f.write(footer)
        f.write(len(footer).to_bytes(8, "little"))
        f.write(section)
        f.write(_SIGNATURE)
