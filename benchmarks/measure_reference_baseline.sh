#!/usr/bin/env bash
# Measure the reference baseline: runs the reference's own NumPy vectorized
# vortex-merger port (the only runnable non-Julia reference implementation;
# Julia is not installable in this image) at the reference config and at
# north-star grids.  Produces the numbers recorded in BASELINE.md
# "Measured reference baseline".
#
# Two variants are timed:
#   as-is : pyfftw -> numpy.fft swap only (pyfftw is not in the image; the
#           swap preserves semantics -- pyfftw's FFTW_BACKWARD normalizes,
#           as ifft2 does)
#   fair  : additionally replaces the port's np.vectorize(complex)
#           per-element Python loop with a native complex cast, which is
#           what the Julia original (complex.(f)) effectively does.  This
#           is the honest Julia-equivalent denominator.
set -euo pipefail

REF=/root/reference/19_NS2D_Vortex_Merger/Python_Vectorized/fdm_vortex_merge_vectorized.py
WORK=$(mktemp -d)
cd "$WORK"

# Strip the interactive plotting tail (everything after the timing print)
# and patch pyfftw -> numpy.fft.  sed edits, not copied code: the timed
# artifact is the reference's file.
head -260 "$REF" > ref_vm.py
python - <<'EOF'
src = open('ref_vm.py').read()
src = src.replace("import pyfftw\n", "")
src = src.replace(
    """    a = pyfftw.empty_aligned((nx, ny), dtype='complex128')
    b = pyfftw.empty_aligned((nx, ny), dtype='complex128')

    fft_object = pyfftw.FFTW(a, b, axes=(0, 1), direction='FFTW_FORWARD')
    fft_object_inv = pyfftw.FFTW(a, b, axes=(0, 1), direction='FFTW_BACKWARD')

    e = fft_object(data)""",
    """    fft_object = np.fft.fft2
    fft_object_inv = np.fft.ifft2

    e = fft_object(data)""")
src = src.replace("import matplotlib.pyplot as plt",
                  "import matplotlib\nmatplotlib.use('Agg')\n"
                  "import matplotlib.pyplot as plt")
open('ref_vm.py', 'w').write(src)
EOF
sed 's/data\[:, :\] = np.vectorize(complex)(f\[1:nx + 1, 1:ny + 1\], 0.0)/data[:, :] = f[1:nx + 1, 1:ny + 1].astype("complex128")/' \
    ref_vm.py > ref_vm_fair.py

mkinput() {  # nd nt dt  (tab-separated first column, ich=19 required)
    printf '%s\t!nd\n%s\t!nt\n1000.0\t!re\n%s\t!dt\n1\t!ns\n1\t!isolver\n1\t!isc\n19\t!ich\n1\t!ipr\n32\t!ndc\n' \
        "$1" "$2" "$3" > input.txt
}

run() {  # variant nd nt dt
    mkinput "$2" "$3" "$4"
    t=$(python "ref_vm_$1.py" 2>/dev/null | tail -1 | awk '{print $NF}')
    echo "$1 nd=$2 nt=$3: total ${t}s  ($(python -c "print(f'{$3/$t:.3f}')") steps/s)"
}

mv ref_vm.py ref_vm_asis.py
echo "# reference NumPy port baseline ($(date -u +%F)):"
run asis 128 2000 0.01
run fair 128 2000 0.01
run asis 1024 20 0.0001
run fair 1024 20 0.0001
run asis 2048 10 0.0001
run fair 2048 10 0.0001
rm -rf "$WORK"
