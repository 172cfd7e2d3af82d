"""Multi-chip / multi-host parallel layer.

The reference is single-process multicore (SURVEY.md §2.4: GATB Dispatcher
threads + disk partitions; no MPI/NCCL anywhere). The TPU-native scaling
story replaces that with a 1-D device mesh:

- data parallel: read batches sharded over mesh axis "d" (the analog of
  Dispatcher blocks, /root/reference/README.md:47-48 -nb-cores)
- k-mer count partials: device-local sort/count, host exact merge
  (multi-host: process allgather over DCN — the analog of DSK's disk
  partition exchange)
- Bloom build: solid-kmer list sharded over devices, per-device bit
  scatter, OR-allreduce via pmax on 0/1 bytes, replicated bitset in HBM
- encode: embarrassingly parallel over lanes with the replicated bitset
"""
