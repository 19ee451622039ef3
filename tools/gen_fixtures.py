#!/usr/bin/env python3
"""Deterministic fixture generator for the GDC-shaped dtype transforms.

Shapes mirror the reference raw-file formats (xena_dataset.py:928-1011):
  - star_counts/tpm/fpkm: 9-column STAR gene counts TSV, one '#' comment
    line, then header, then N_* summary rows, then genes
  - segment_cnv_DNAcopy: GDC_Aliquot/Chromosome/Start/End/Num_Probes/
    Segment_Mean with header
  - methylation: headerless (cpg, beta)
  - protein: AGID/lab_id/catalog_number/set_id/peptide_target/
    protein_expression with header
  - somaticmutation (MAF): 140 tab columns, gzip, '#version' comment
    line; one file intentionally has zero data rows (sentinel-row path)
  - survival.tsv + case_samples.json (GDCSurvivalset.transform inputs)
  - cases.json: nested clinical JSON (diagnoses/treatments/
    pathology_details/annotations/samples)
  - images: ASCII PPM files (binary-column / multimodal fixtures)

No RNG: every value is a closed-form function of indices. Output is
committed; re-running must be byte-identical.
"""
import gzip
import json
import os

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

UUIDS = [
    "1a2b3c4d-0001-4001-8001-aaaaaaaa0001",
    "1a2b3c4d-0002-4002-8002-aaaaaaaa0002",
    "1a2b3c4d-0003-4003-8003-aaaaaaaa0003",
    "1a2b3c4d-0004-4004-8004-aaaaaaaa0004",
]

GENES = ["ENSG00000000%03d.%d" % (i, i % 10) for i in range(1, 9)]


def w(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        f.write(text)


def star_counts():
    header = ["gene_id", "gene_name", "gene_type", "unstranded",
              "stranded_first", "stranded_second", "tpm_unstranded",
              "fpkm_unstranded", "fpkm_uq_unstranded"]
    samples = [("SAMP-01A", 0), ("SAMP-01A", 1), ("SAMP-02A", 2), ("SAMP-11A", 3)]
    for fi, (sid, uidx) in enumerate(samples):
        lines = ["# gene-model: GENCODE v36", "\t".join(header)]
        for srow in ["N_unmapped", "N_multimapping", "N_noFeature", "N_ambiguous"]:
            lines.append("\t".join([srow, "", ""] + [str(90000 + fi)] * 6))
        for gi, g in enumerate(GENES):
            count = (gi * 7 + fi * 13) % 100
            tpm = round(count / 3.0, 4)
            fpkm = round(count / 7.0, 4)
            fpkmuq = round(count / 11.0, 4)
            lines.append("\t".join([
                g, "GENE%d" % gi, "protein_coding", str(count),
                str(count + 1), str(count + 2), str(tpm), str(fpkm), str(fpkmuq)]))
        name = "%s.%s.rna_seq.augmented_star_gene_counts.tsv" % (sid, UUIDS[uidx])
        w(os.path.join(ROOT, "star_counts", name), "\n".join(lines) + "\n")


def segment_cnv():
    header = ["GDC_Aliquot", "Chromosome", "Start", "End", "Num_Probes", "Segment_Mean"]
    for fi, sid in enumerate(["SAMP-01A", "SAMP-02A"]):
        lines = ["\t".join(header)]
        for si in range(5):
            start = 1000 * (si + 1) + fi
            lines.append("\t".join([
                "aliquot-%d" % fi, "chr%d" % (si + 1), str(start),
                str(start + 5000), str(40 + si), str(round((si - 2) * 0.31 + fi * 0.05, 4))]))
        name = "%s.%s.grch38.seg.v2.txt" % (sid, UUIDS[fi])
        w(os.path.join(ROOT, "segment_cnv_DNAcopy", name), "\n".join(lines) + "\n")


def methylation():
    for fi, sid in enumerate(["SAMP-01A", "SAMP-02A"]):
        lines = []
        for ci in range(6):
            beta = round(0.05 + 0.13 * ci + 0.01 * fi, 4)
            lines.append("cg%08d\t%s" % (ci, beta))
        name = "%s.%s.methylation_array.sesame.level3betas.txt" % (sid, UUIDS[fi])
        w(os.path.join(ROOT, "methylation450", name), "\n".join(lines) + "\n")


def protein():
    header = ["AGID", "lab_id", "catalog_number", "set_id", "peptide_target", "protein_expression"]
    for fi, sid in enumerate(["SAMP-01A", "SAMP-02A"]):
        lines = ["\t".join(header)]
        for pi in range(5):
            expr = round(-1.5 + 0.71 * pi + 0.1 * fi, 4)
            lines.append("\t".join([
                "AGID%03d" % pi, "lab%d" % pi, "cat%d" % pi, "set%d" % pi,
                "PEP_%d" % pi, str(expr)]))
        name = "%s.%s.protein_expression.tsv" % (sid, UUIDS[fi])
        w(os.path.join(ROOT, "protein", name), "\n".join(lines) + "\n")


MAF_USED = {0: "Hugo_Symbol", 4: "Chromosome", 5: "Start_Position",
            6: "End_Position", 10: "Reference_Allele", 12: "Tumor_Seq_Allele2",
            15: "Tumor_Sample_Barcode", 36: "HGVSp_Short", 39: "Consequence",
            41: "t_depth", 51: "t_alt_count", 139: "callers"}


def maf():
    ncols = 140
    header = [MAF_USED.get(i, "f%03d" % i) for i in range(ncols)]
    muts = [
        ("TP53", "chr17", 7675000, 7675001, "C", "T", "p.R175H", "missense_variant", 120, 30),
        ("KRAS", "chr12", 25245350, 25245351, "G", "A", "p.G12D", "missense_variant", 90, 45),
        ("EGFR", "chr7", 55191822, 55191823, "T", "G", "p.L858R", "missense_variant", 200, 50),
        ("BRAF", "chr7", 140753336, 140753337, "A", "T", "p.V600E", "missense_variant", 150, 75),
        ("PTEN", "chr10", 87933147, 87933148, "G", "", "p.K128fs", "frameshift_variant", 80, 20),
    ]
    for fi, (sid, nmut) in enumerate([("SAMP-01A", 5), ("SAMP-02A", 0)]):
        lines = ["#version gdc-1.0.0", "\t".join(header)]
        for mi in range(nmut):
            gene, chrom, s, e, ref, alt, hgvsp, cons, depth, altc = muts[mi]
            row = ["" for _ in range(ncols)]
            row[0], row[4], row[5], row[6] = gene, chrom, str(s), str(e)
            row[10], row[12], row[15] = ref, alt, "%s-TUMOR-BARCODE" % sid
            row[36], row[39] = hgvsp, cons
            row[41], row[51] = str(depth), str(altc)
            row[139] = "muse;mutect2"
            lines.append("\t".join(row))
        name = "%s.%s.wxs.aliquot_ensemble_masked.maf.gz" % (sid, UUIDS[fi])
        path = os.path.join(ROOT, "somaticmutation_wxs", name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # mtime=0 for reproducible gzip bytes
        with gzip.GzipFile(path, "wb", mtime=0) as f:
            f.write(("\n".join(lines) + "\n").encode())


def mirna():
    header = ["miRNA_ID", "read_count", "reads_per_million_miRNA_mapped", "cross-mapped"]
    for fi, sid in enumerate(["SAMP-01A", "SAMP-02A"]):
        lines = ["\t".join(header)]
        for mi in range(6):
            rc = (mi * 11 + fi * 3) % 50
            rpm = rc * 4 + 0.25 * mi  # exact binary fractions
            lines.append("\t".join(["hsa-mir-%03d" % mi, str(rc), str(rpm), "N"]))
        name = "%s.%s.mirbase21.mirnas.quantification.txt" % (sid, UUIDS[fi])
        w(os.path.join(ROOT, "mirna", name), "\n".join(lines) + "\n")


def mirna_isoform():
    header = ["miRNA_ID", "isoform_coords", "read_count",
              "reads_per_million_miRNA_mapped", "cross-mapped", "miRNA_region"]
    for fi, sid in enumerate(["SAMP-01A", "SAMP-02A"]):
        lines = ["\t".join(header)]
        for mi in range(5):
            rpm = mi * 7 + 0.5 * fi
            lines.append("\t".join([
                "hsa-mir-%03d" % mi,
                "hg38:chr%d:%d-%d:+" % (mi + 1, 1000 * mi + 10, 1000 * mi + 31),
                str(mi * 9 + fi), str(rpm), "N", "mature"]))
        name = "%s.%s.mirbase21.isoforms.quantification.txt" % (sid, UUIDS[fi])
        w(os.path.join(ROOT, "mirna_isoform", name), "\n".join(lines) + "\n")


def gene_level_cnv():
    # exercises the fillna('NA') + log2TF=False branch: some empty
    # copy_number cells
    header = ["gene_id", "gene_name", "chromosome", "start", "end",
              "copy_number", "min_copy_number", "max_copy_number"]
    for fi, sid in enumerate(["SAMP-01A", "SAMP-02A"]):
        lines = ["\t".join(header)]
        for gi, g in enumerate(GENES):
            cn = "" if (gi + fi) % 4 == 3 else str((gi * 3 + fi) % 6 * 0.5)
            lines.append("\t".join([
                g, "GENE%d" % gi, "chr%d" % (gi + 1), str(10000 * gi + 1),
                str(10000 * gi + 9999), cn, "0", "8"]))
        name = "%s.%s.gene_level_copy_number.v36.tsv" % (sid, UUIDS[fi])
        w(os.path.join(ROOT, "gene-level_ascat-ngs", name), "\n".join(lines) + "\n")


def segment_ascat():
    # AscatNGS/allele shape: value column is Copy_Number at position 4
    header = ["GDC_Aliquot", "Chromosome", "Start", "End", "Copy_Number",
              "Major_Copy_Number", "Minor_Copy_Number"]
    for fi, sid in enumerate(["SAMP-01A", "SAMP-02A"]):
        lines = ["\t".join(header)]
        for si in range(4):
            start = 500 * (si + 1) + fi
            lines.append("\t".join([
                "aliquot-%d" % fi, "chr%d" % (si + 1), str(start),
                str(start + 2500), str((si + fi) % 5), str(si % 3), str(fi % 2)]))
        name = "%s.%s.ascat_ngs.copy_number_variation.seg.txt" % (sid, UUIDS[fi])
        w(os.path.join(ROOT, "segment_cnv_ascat-ngs", name), "\n".join(lines) + "\n")


def survival():
    rows = [
        ("case1", "TCGA-XX", 0.9, "false", 450, "PAT-01"),
        ("case2", "TCGA-XX", 0.8, "true", 1200, "PAT-02"),
        ("case3", "TCGA-XX", 0.7, "false", 300, "PAT-03"),
    ]
    lines = ["\t".join(["id", "project_id", "survivalEstimate", "censored", "time", "submitter_id"])]
    for r in rows:
        lines.append("\t".join(str(x) for x in r))
    w(os.path.join(ROOT, "survival", "survival.tsv"), "\n".join(lines) + "\n")
    case_samples = [
        {"id": "case1", "samples": [
            {"submitter_id": "SAMP-01A", "sample_type": "Primary Tumor"},
            {"submitter_id": "SAMP-01B", "sample_type": "Blood Derived Normal"}]},
        {"id": "case2", "samples": [
            {"submitter_id": "SAMP-02A", "sample_type": "Primary Tumor"}]},
        {"id": "case3", "samples": [
            {"submitter_id": "SAMP-11A", "sample_type": "Primary Tumor"}]},
        {"id": "case4"},  # no samples key: dropped by the pipeline
    ]
    w(os.path.join(ROOT, "survival", "case_samples.json"),
      "\n".join(json.dumps(c, sort_keys=True) for c in case_samples) + "\n")


def clinical():
    cases = [
        {
            "id": "case1", "submitter_id": "PAT-01", "disease_type": "Adenomas",
            "project": {"project_id": "TCGA-XX"},
            "demographic": {"gender": "female", "vital_status": "Alive", "year_of_birth": 1960},
            "state": "released", "created_datetime": "2020-01-01",
            "annotations": [{"category": "Item flagged", "classification": "Notification"}],
            "diagnoses": [
                {"age_at_diagnosis": "20100", "tumor_grade": "G2",
                 "treatments": [
                     {"therapeutic_agents": "Tamoxifen", "treatment_type": "Chemo"},
                     {"therapeutic_agents": "Cisplatin", "treatment_type": "Chemo"}],
                 "pathology_details": [{"lymph_nodes_tested": "12"}]},
                {"age_at_diagnosis": "not reported", "tumor_grade": "G3",
                 "treatments": [], "pathology_details": []},
            ],
            "samples": [
                {"submitter_id": "SAMP-01A", "sample_type": "Primary Tumor", "tissue_type": "Tumor"},
                {"submitter_id": "SAMP-01B", "sample_type": "Blood Derived Normal", "tissue_type": "Normal"}],
        },
        {
            "id": "case2", "submitter_id": "PAT-02", "disease_type": "Gliomas",
            "project": {"project_id": "TCGA-XX"},
            "demographic": {"gender": "male", "vital_status": "Dead", "year_of_birth": 1955},
            "state": "released", "created_datetime": "2020-02-01",
            "annotations": [],
            "diagnoses": [
                {"age_at_diagnosis": "15000", "tumor_grade": "G1",
                 "treatments": [{"therapeutic_agents": "Temozolomide", "treatment_type": "Chemo"}],
                 "pathology_details": []}],
            "samples": [
                {"submitter_id": "SAMP-02A", "sample_type": "Primary Tumor", "tissue_type": "Tumor"}],
        },
        {
            "id": "case3", "submitter_id": "PAT-03", "disease_type": "Sarcomas",
            "project": {"project_id": "TCGA-XX"},
            "demographic": {"gender": "female", "vital_status": "Alive", "year_of_birth": 1971},
            "state": "released", "created_datetime": "2020-03-01",
            "annotations": [],
            "diagnoses": [],
            "samples": [
                {"submitter_id": "SAMP-11A", "sample_type": "Primary Tumor", "tissue_type": "Tumor"}],
        },
    ]
    w(os.path.join(ROOT, "clinical", "cases.json"),
      "\n".join(json.dumps(c, sort_keys=True) for c in cases) + "\n")


def images():
    # ASCII PPM (P3): a real image format whose bytes are ASCII — the
    # oracle can md5 the content as text.
    for i in range(3):
        wpx, hpx = 4 + i, 3 + i
        flat = []
        for y in range(hpx):
            for x in range(wpx):
                flat += [(x * 37) % 256, (y * 53) % 256, ((x + y) * 11) % 256]
        def body(values):
            triples = ["%d %d %d" % tuple(values[k:k + 3])
                       for k in range(0, len(values), 3)]
            return "P3\n%d %d\n255\n%s\n" % (wpx, hpx, "\n".join(triples))
        w(os.path.join(ROOT, "images", "img_%d.ppm" % i), body(flat))
        # Near-duplicate twin: one channel of one pixel brightened.
        # +160 on the second pixel's green lands the twin aHash
        # distances at {6, 4, 1} bits for i={0,1,2}; the original
        # images sit 7-9 bits apart, and img_1 vs img_2_dup is a TRUE
        # hamming-6 neighbor (the tiny originals leave no wider
        # margin; an exhaustive search over single-pixel deltas found
        # no configuration separating twins <=T from cross-family >T
        # for any T). q95 at threshold 6 therefore returns the three
        # twins plus that one cross pair - the planted truth its spec
        # asserts exactly.
        dup = list(flat)
        dup[4] = min(255, dup[4] + 160)
        w(os.path.join(ROOT, "images", "img_%d_dup.ppm" % i), body(dup))


def audio():
    # Canonical 44-byte PCM WAV (RIFF): a real binary format parseable
    # without codec libraries. Payload is a closed-form LCG byte stream
    # (no RNG module — deterministic, committed). The oracle reads the
    # same bytes via DuckDB read_blob + hex().
    import struct
    specs = [(8000, 1, 16, 9000), (16000, 2, 16, 12000), (22050, 1, 16, 16384)]
    for i, (rate, ch, bits, nsamp) in enumerate(specs):
        block = ch * bits // 8
        data_len = nsamp * block
        x = 1234567 + i
        buf = bytearray()
        for _ in range(data_len):
            x = (1103515245 * x + 12345) % (1 << 31)
            buf.append(x & 0xFF)
        hdr = (b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                       rate * block, block, bits)
               + b"data" + struct.pack("<I", data_len))
        path = os.path.join(ROOT, "audio", "clip_%d.wav" % i)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(hdr + bytes(buf))


def audio_nd():
    # Near-dup audio corpus (separate dir so audio/* query results are
    # untouched): 4 independent LCG clips + 3 twins. A twin halves the
    # samples of a few windows, pushing those window means below the
    # clip mean — a small, known eHash hamming distance; independent
    # clips land ~half the 64 bits apart. The generator computes the
    # ACTUAL eHash distances (the same exact integer math as
    # AudioOps.energyHash64 / the q99 oracle) and asserts the planted
    # separation, so a regeneration that breaks the margin fails here,
    # not in the gate.
    import struct
    rate, ch, bits, nsamp = 8000, 1, 16, 4096
    block = ch * bits // 8

    def lcg_payload(seed, n_bytes):
        # High LCG bits, not x & 0xFF: for a power-of-two modulus the
        # low byte is periodic (period 256, seed-independent phase) —
        # every clip would hash identically.
        x = seed
        buf = bytearray()
        for _ in range(n_bytes):
            x = (1103515245 * x + 12345) % (1 << 31)
            buf.append((x >> 16) & 0xFF)
        return buf

    def samples_of(buf):
        out = []
        for j in range(len(buf) // 2):
            v = buf[2 * j] | (buf[2 * j + 1] << 8)
            if v >= 32768:
                v -= 65536
            out.append(v)
        return out

    def ehash(samples):
        n = len(samples)
        ws, wc = [0] * 64, [0] * 64
        total = 0
        for j, s in enumerate(samples):
            a = abs(s)
            w = (j * 64) // n
            ws[w] += a
            wc[w] += 1
            total += a
        return [1 if ws[w] * n > total * wc[w] else 0 for w in range(64)]

    def wav_bytes(payload):
        data_len = len(payload)
        return (b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                        rate * block, block, bits)
                + b"data" + struct.pack("<I", data_len) + bytes(payload))

    clips = {}
    for i in range(4):
        clips["clip_%d.wav" % i] = lcg_payload(7654321 + 97 * i, nsamp * block)
    for i in range(3):
        base = bytearray(clips["clip_%d.wav" % i])
        smp = samples_of(base)
        # Halve the energy of window 3+i (64 samples) — one window's
        # mean drops below the clip mean, a ~1-3 bit flip.
        for w in range(3 + i, 4 + i):
            for j in range(w * nsamp // 64, (w + 1) * nsamp // 64):
                smp[j] //= 2
        dup = bytearray()
        for v in smp:
            dup += struct.pack("<h", v)
        clips["clip_%d_dup.wav" % i] = dup

    sigs = {name: ehash(samples_of(payload)) for name, payload in clips.items()}
    names = sorted(sigs)
    for a_i, a in enumerate(names):
        for b in names[a_i + 1:]:
            d = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            twin = b == a.replace(".wav", "_dup.wav")
            # Planted truth: twins within 4 bits, everything else
            # beyond the banding recall bound (2*4-1 = 7).
            assert (d <= 4) == twin and (twin or d > 7), (a, b, d)
    for name, payload in clips.items():
        path = os.path.join(ROOT, "audio_nd", name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(wav_bytes(payload))


def _avi_blob(wd, ht, uspf, frames):
    # Canonical uncompressed AVI (RIFF): LIST hdrl {avih, LIST strl
    # {strh 'vids'/'DIB ', strf BITMAPINFOHEADER}} + LIST movi with one
    # '00db' chunk per raw BGR frame. A real container format walkable
    # without codec libraries. Widths keep row_bytes (w*3) a multiple
    # of 4, so there is no DIB row padding and frame_size == w*h*3
    # exactly — which is what lets the DuckDB oracles compute chunk
    # offsets arithmetically (movi data starts at byte 232; frame i
    # data at 232 + i*(8+fs)).
    import struct
    fs = wd * ht * 3
    nframes = len(frames)
    avih = struct.pack("<14I", uspf, fs * 1000000 // uspf, 0, 0x10,
                       nframes, 0, 1, fs, wd, ht, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
            uspf, 1000000, 0, nframes, fs, 10000, 0)
            + struct.pack("<4h", 0, 0, wd, ht))
    strf = struct.pack("<IiiHHIIiiII", 40, wd, ht, 1, 24, 0, fs, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl" \
        + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) + b"hdrl" \
        + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    movi_body = b"".join(b"00db" + struct.pack("<I", fs) + bytes(fr) for fr in frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    assert len(hdrl) == 200 and blob.index(b"movi") == 220, \
        "canonical AVI layout drifted; the video oracles assume it"
    return blob


def video():
    specs = [(8, 6, 40000, 12), (16, 8, 33333, 10), (4, 4, 100000, 20)]
    for vi, (wd, ht, uspf, nframes) in enumerate(specs):
        fs = wd * ht * 3
        frames = []
        x = 7654321 + vi
        for fi in range(nframes):
            buf = bytearray()
            for _ in range(fs):
                x = (1103515245 * x + 12345) % (1 << 31)
                buf.append(x & 0xFF)
            frames.append(bytes(buf))
        path = os.path.join(ROOT, "video", "clip_%d.avi" % vi)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(_avi_blob(wd, ht, uspf, frames))


def video_nd():
    # Frame-level near-dup video corpus (separate dir so video/*
    # query results are untouched): 2 LCG clips + one twin of clip_0
    # whose frame 3 halves the brightness of its top row. Aligned
    # unperturbed twin frames are byte-identical (frame-hash hamming
    # 0); the perturbed frame lands a few bits away; cross-content
    # frames sit ~half the 64 bits apart. High LCG bits feed the
    # pixels (the low byte is periodic — see audio_nd). The generator
    # recomputes the ACTUAL frame aHashes (decode + 8x8 nearest
    # resize + exact integer mean test, mirroring ImageOps/the q102
    # oracle) and asserts the planted separation.
    wd, ht, uspf, nframes = 8, 6, 40000, 6
    fs = wd * ht * 3

    def lcg_frames(seed):
        x = seed
        out = []
        for _ in range(nframes):
            buf = bytearray()
            for _ in range(fs):
                x = (1103515245 * x + 12345) % (1 << 31)
                buf.append((x >> 16) & 0xFF)
            out.append(buf)
        return out

    clips = {"clip_0.avi": lcg_frames(1357), "clip_1.avi": lcg_frames(2468)}
    twin = [bytearray(fr) for fr in clips["clip_0.avi"]]
    # total-preserving perturbation of frame 3: swap the source pixels
    # of one below-mean and one above-mean aHash cell on display row 1
    # (stored row ht-2; that source row nearest-resizes to exactly one
    # 8x8 output row, y=2). The clip total is unchanged, so EXACTLY
    # those two bits flip — planted hamming 2 by construction.
    def cell_g(fr, sx):
        off = (ht - 2) * wd * 3 + sx * 3
        return fr[off] + fr[off + 1] + fr[off + 2]
    f3 = twin[3]
    # the aHash mean test runs over CELL sums (64*g vs sum of the 64
    # cell g-values), so compute those:
    gs3 = []
    for k in range(64):
        y, x = k // 8, k % 8
        sy, sx = (y * ht) // 8, (x * wd) // 8
        off = ((ht - 1 - sy) * wd + sx) * 3
        gs3.append(f3[off] + f3[off + 1] + f3[off + 2])
    cell_total = sum(gs3)
    row2 = [(x, gs3[2 * 8 + x]) for x in range(8)]  # cells (x, y=2), sy=1
    lo = next(x for x, g in row2 if 64 * g <= cell_total)
    hi = next(x for x, g in row2 if 64 * g > cell_total)
    base = (ht - 2) * wd * 3
    for c in range(3):
        f3[base + lo * 3 + c], f3[base + hi * 3 + c] = \
            f3[base + hi * 3 + c], f3[base + lo * 3 + c]
    clips["clip_0_dup.avi"] = twin

    def ahash(frame):
        # decode bottom-up BGR -> top-down grid, 8x8 nearest resize,
        # g = r+g+b, bit = 64*g > total (exact integers)
        gs = []
        for k in range(64):
            y, x = k // 8, k % 8
            sy, sx = (y * ht) // 8, (x * wd) // 8
            off = ((ht - 1 - sy) * wd + sx) * 3
            gs.append(frame[off] + frame[off + 1] + frame[off + 2])
        tot = sum(gs)
        return [1 if 64 * g > tot else 0 for g in gs]

    sigs = {"%s#%03d" % (n, i): ahash(fr)
            for n, frs in clips.items() for i, fr in enumerate(frs)}
    names = sorted(sigs)
    n_zero = n_near = 0
    for ai, a in enumerate(names):
        for b in names[ai + 1:]:
            d = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            fa, ia = a.split("#")
            fb, ib = b.split("#")
            twin_pair = ia == ib and {fa, fb} == {"clip_0.avi", "clip_0_dup.avi"}
            if twin_pair and ia != "003":
                assert d == 0, (a, b, d)
                n_zero += 1
            elif twin_pair:
                assert d == 2, (a, b, d)
                n_near += 1
            else:
                assert d > 7, (a, b, d)
    assert n_zero == 5 and n_near == 1
    for name, frs in clips.items():
        path = os.path.join(ROOT, "video_nd", name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(_avi_blob(wd, ht, uspf, frs))


if __name__ == "__main__":
    star_counts()
    segment_cnv()
    methylation()
    protein()
    maf()
    mirna()
    mirna_isoform()
    gene_level_cnv()
    segment_ascat()
    survival()
    clinical()
    images()
    audio()
    audio_nd()
    video()
    video_nd()
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print("wrote %d fixture files under %s" % (n, ROOT))
