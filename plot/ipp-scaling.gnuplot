# SIPP scaling plot (sipp/plot/ipp-scaling.gnuplot parity): consumes the
# size,direct,prover,verifier CSVs written by `python -m benches.scaling_ipp`,
# with device counts standing in for the reference's thread counts.

ipp_1_csv = "data/ipp-1-devices.csv"
ipp_2_csv = "data/ipp-2-devices.csv"
ipp_4_csv = "data/ipp-4-devices.csv"
ipp_8_csv = "data/ipp-8-devices.csv"

set terminal pdfcairo font "Roboto Sans,12" size 4,3 background rgb 'white'
set termoption enhanced
set datafile separator ","

set xtics 2 nomirror
set ytics nomirror
set xrange [*:*]
set grid back lt 1 dt 3 lc rgb 'grey'
set key top left
set logscale x 2
set logscale y 10
set xlabel "pairing-product size n"
set ylabel "seconds"

set output "ipp-prover-scaling.pdf"
plot ipp_1_csv using 1:3 w lp title "1 device", \
     ipp_2_csv using 1:3 w lp title "2 devices", \
     ipp_4_csv using 1:3 w lp title "4 devices", \
     ipp_8_csv using 1:3 w lp title "8 devices"

set output "ipp-verifier-scaling.pdf"
plot ipp_1_csv using 1:4 w lp title "1 device", \
     ipp_2_csv using 1:4 w lp title "2 devices", \
     ipp_4_csv using 1:4 w lp title "4 devices", \
     ipp_8_csv using 1:4 w lp title "8 devices"

set output "ipp-direct-vs-outsourced.pdf"
plot ipp_8_csv using 1:2 w lp title "direct", \
     ipp_8_csv using 1:4 w lp title "verifier (outsourced)"
