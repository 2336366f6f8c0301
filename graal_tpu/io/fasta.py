"""FASTA import and assembled-genome export.

Mirrors the reference's sequence handling: reference-genome loading
(pyramid.load_reference_sequence, pyramid_sparse.py:1148-1174), per-bin
sequence extraction (level.build_seq_per_bin :1411-1428) and the final
orientation-aware export of the reassembled genome with its companion
``info_frags.txt`` table (level.generate_new_fasta :1430-1488).
"""

from __future__ import annotations

import numpy as np

_COMPLEMENT = str.maketrans("TAGCtagc", "ATCGatcg")


def load_fasta(path: str) -> dict:
    """contig name -> sequence (full header line after '>' is the name)."""
    seqs = {}
    name = None
    chunks = []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    seqs[name] = "".join(chunks)
                name = line[1:]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        seqs[name] = "".join(chunks)
    return seqs


def reverse_complement(seq: str) -> str:
    return seq[::-1].translate(_COMPLEMENT)


def write_fasta(path: str, contigs: dict, line_len: int = 60):
    with open(path, "w") as fh:
        for header, seq in contigs.items():
            fh.write(f">{header}\n")
            for i in range(0, len(seq), line_len):
                fh.write(seq[i:i + line_len] + "\n")


def export_assembly(state, frag_chrom, frag_start, frag_end, sequences,
                    fasta_path: str, info_path: str):
    """Write the reassembled genome.

    - ``state``: final GenomeState (host copy ok).
    - ``frag_chrom`` / ``frag_start`` / ``frag_end``: per *data-bin* source
      coordinates (the sampling level's fragments).
    - ``sequences``: dict of source contig name -> sequence.

    Contigs are emitted ordered by (id_c, pos); fragments with ori == -1 are
    reverse-complemented; contigs containing any inactive fragment are
    skipped (repeat copies switched off), matching generate_new_fasta
    (pyramid_sparse.py:1430-1488). ``info_frags.txt`` lists
    (init_contig, id_frag, orientation, start, end) per fragment.
    """
    id_c = np.asarray(state.id_c)
    pos = np.asarray(state.pos)
    ori = np.asarray(state.ori)
    activ = np.asarray(state.activ)
    id_d = np.asarray(state.id_d)

    out_contigs = {}
    with open(info_path, "w") as info:
        for c in np.unique(id_c):
            members = np.nonzero(id_c == c)[0]
            if not np.all(activ[members] == 1):
                continue
            header = f"3C-assembly|contig_{c}"
            info.write(f">{header}\n")
            info.write("init_contig\tid_frag\torientation\tstart\tend\n")
            ordered = members[np.argsort(pos[members])]
            seq_parts = []
            for f in ordered:
                b = int(id_d[f])
                chrom = frag_chrom[b]
                start, end = int(frag_start[b]), int(frag_end[b])
                piece = sequences[chrom][start:end]
                if ori[f] == -1:
                    piece = reverse_complement(piece)
                seq_parts.append(piece)
                info.write(f"{chrom}\t{b}\t{int(ori[f])}\t{start}\t{end}\n")
            out_contigs[header] = "".join(seq_parts)
    write_fasta(fasta_path, out_contigs, line_len=60)
    return out_contigs
