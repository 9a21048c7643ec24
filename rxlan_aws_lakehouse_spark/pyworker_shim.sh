#!/usr/bin/env bash
# PySpark worker exec shim (r17, guide §4 — the Python boundary).
#
# Spark launches helper interpreters — the per-stream-start
# python_streaming_source_runner (PythonWorkerFactory.createSimpleWorker,
# hardcoded non-daemon) and the pyspark.daemon pools — with
# $SPARK_HOME/python/lib/pyspark.zip FIRST on PYTHONPATH
# (PythonUtils.sparkPythonPath precedes every caller entry in
# mergePythonPaths). zipimport cannot persist compiled bytecode, so every
# such spawn recompiles pyspark's .py sources: measured 1.18 s per import
# from the zip vs 0.45 s from the pyc-cached site-packages install of the
# SAME 4.1.2 version. This shim drops the redundant zip entries so the
# worker resolves pyspark/py4j from the interpreter's site-packages —
# ONLY when the driver verified that resolution works (it exports
# SPARK_GRAFT_SITE_OK after importing both outside any zip). With the
# guard unset, PYTHONPATH passes through untouched.
if [ -n "$SPARK_GRAFT_SITE_OK" ]; then
  IFS=':' read -ra _parts <<< "${PYTHONPATH:-}"
  _out=()
  for p in "${_parts[@]}"; do
    case "$p" in
      */pyspark.zip|*/py4j-*-src.zip) ;;
      *) _out+=("$p") ;;
    esac
  done
  PYTHONPATH=$(IFS=:; echo "${_out[*]-}")
  export PYTHONPATH
fi
exec "${SPARK_GRAFT_REAL_PYTHON:-python3}" "$@"
