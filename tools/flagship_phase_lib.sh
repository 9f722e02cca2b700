# Shared phase-runner helpers for the flagship training recipes
# (run_flagship_{lowrate,midrate,compressed}.sh). Source after defining
# OUT and COMMON.
#
# Phases run to a TOTAL epoch target (persisted in ${dir}/PHASE_TARGET) and
# survive two distinct failure modes of long unattended runs on the relay:
#  - host-RSS watchdog restarts: train.py exits 75 when RSS crosses
#    --max_host_rss_gb after saving an exact `latest` state (the relay
#    client leaks host memory per upload — data/device_cache.py), and the
#    loop relaunches a fresh process that resumes losslessly;
#  - relay stalls: the relay occasionally hangs one request forever
#    (observed: train.py silent 11+ min, every thread in futex_wait, one
#    idle TCP to the relay). A sidecar guard kills train.py when the loss
#    log goes silent for STALL_TIMEOUT (default 1500s — full-size compiles
#    legitimately go ~10-18 min without output); the retry loop treats any
#    nonzero exit as transient when the invocation made progress (>= one
#    epoch of log lines), with a 3-strike cap so a genuinely broken config
#    still aborts instead of crash-looping.
#
# Marker files (PHASE_DONE / PHASE_TARGET / trainer_meta.json) are only
# trusted when an actual checkpoint is present — a fresh clone carries the
# committed sidecars but gitignores the multi-GB params/ dirs, and must
# retrain from scratch rather than crash on a phantom resume.

# epochs completed in a phase dir: best-val checkpoint or watchdog `latest`,
# whichever is newer (train/checkpoint.py trainer_meta.json sidecars).
# Sidecars without a params/ checkpoint next to them count as nothing.
done_epochs () {
  python - "$1" <<'PY'
import json, os, sys
d = sys.argv[1]
best = -1
for sub in ("", "latest"):
    meta = os.path.join(d, sub, "trainer_meta.json")
    params = os.path.join(d, sub, "params")
    if os.path.isdir(params):
        try:
            best = max(best, json.load(open(meta))["epoch"])
        except Exception:
            pass
print(best + 1)
PY
}

# run `python train.py "$@"` with a log-silence stall guard on ${dir}.
# Silence is measured from max(loss_log mtime, THIS invocation's start):
# the log predates the process (previous invocation wrote it), and an
# age-from-mtime guard would kill every retry during its legitimate
# multi-minute startup (init + load + validate writes nothing until done).
_train_with_stall_guard () {
  local dir=$1; shift
  local started
  started=$(date +%s)
  python train.py "$@" &
  local tpid=$!
  (
    while kill -0 "${tpid}" 2>/dev/null; do
      sleep 60
      last="${started}"
      if [ -f "${dir}/loss_log.txt" ]; then
        mt=$(stat -c %Y "${dir}/loss_log.txt")
        [ "${mt}" -gt "${last}" ] && last="${mt}"
      fi
      age=$(( $(date +%s) - last ))
      if [ "${age}" -gt "${STALL_TIMEOUT:-1500}" ]; then
        echo "--- stall guard: no log output for ${age}s; killing train.py (${tpid}) ---"
        kill "${tpid}" 2>/dev/null
        sleep 15
        kill -9 "${tpid}" 2>/dev/null
        break
      fi
    done
  ) &
  local gpid=$!
  local rc=0
  wait "${tpid}" || rc=$?
  kill "${gpid}" 2>/dev/null
  wait "${gpid}" 2>/dev/null || true
  return "${rc}"
}

_log_lines () {
  wc -l < "$1/loss_log.txt" 2>/dev/null || echo 0
}

run_phase () {
  local name=$1 prev=$2 epochs=$3; shift 3
  local dir=${OUT}/${name}
  mkdir -p "${dir}"
  if [ -f "${dir}/PHASE_DONE" ] && [ -d "${dir}/params" ]; then
    echo "--- phase ${name} already complete ---"
    return
  fi
  local strikes=0 rc lines_before lines_after
  # bootstrap epoch (always_save) unless resuming this phase
  while [ ! -d "${dir}/params" ] && [ ! -d "${dir}/latest/params" ]; do
    rm -f "${dir}/PHASE_DONE" "${dir}/PHASE_TARGET"  # stale committed markers
    local load=""
    if [ -n "${prev}" ]; then load="--load_model --checkpoints_dir ${prev}"; fi
    set +e
    _train_with_stall_guard "${dir}" ${COMMON} "$@" ${load} \
      --save_dir "${dir}" --num_epochs 1 --always_save --val_interval 1
    rc=$?
    set -e
    if [ "${rc}" -ne 0 ]; then
      strikes=$((strikes + 1))
      echo "--- phase ${name} bootstrap failed (rc=${rc}, strike ${strikes}/3) ---"
      if [ "${strikes}" -ge 3 ]; then exit "${rc}"; fi
    fi
  done
  if [ ! -f "${dir}/PHASE_TARGET" ]; then
    echo $(( $(done_epochs "${dir}") + epochs )) > "${dir}/PHASE_TARGET"
  fi
  local target
  target=$(cat "${dir}/PHASE_TARGET")
  # Two failure budgets:
  #  - strikes: consecutive failures with no visible progress at all
  #    (< one epoch of new log lines) -> genuinely broken config, abort at 3.
  #  - soft_strikes: consecutive failures that logged >= one epoch but never
  #    advanced a durable checkpoint (done_epochs). Log lines alone are NOT
  #    durable progress: a deterministic crash a few epochs past the resume
  #    point replays the same window every retry, and a log-lines-only gate
  #    would reset strikes forever and crash-loop unattended. Bounded at 6
  #    (checkpoints land every val_interval epochs, so several mid-window
  #    transient relay drops are tolerated before we conclude it's a loop).
  strikes=0
  local soft_strikes=0 done_before done_after
  while true; do
    local done rem
    done=$(done_epochs "${dir}")
    rem=$(( target - done ))
    if [ "${rem}" -le 0 ]; then break; fi
    echo "--- phase ${name}: ${done}/${target} epochs checkpointed, running ${rem} more ---"
    lines_before=$(_log_lines "${dir}")
    done_before=${done}
    set +e
    _train_with_stall_guard "${dir}" ${COMMON} "$@" \
      --load_model --checkpoints_dir "${dir}" \
      --save_dir "${dir}" --num_epochs "${rem}"
    rc=$?
    set -e
    if [ "${rc}" -eq 0 ]; then
      break
    elif [ "${rc}" -eq 75 ]; then
      echo "--- watchdog restart (host RSS cap) ---"
      strikes=0; soft_strikes=0
      continue
    fi
    lines_after=$(_log_lines "${dir}")
    done_after=$(done_epochs "${dir}")
    if [ "${done_after}" -gt "${done_before}" ]; then
      # durable progress: a newer checkpoint exists; the retry resumes past it
      echo "--- transient failure (rc=${rc}) after checkpoint progress; restarting ---"
      strikes=0; soft_strikes=0
    elif [ $(( lines_after - lines_before )) -ge "${LINES_PER_EPOCH:-11}" ]; then
      # >= one epoch of log output (LINES_PER_EPOCH; default 11 = the
      # flagship recipes' 22-image/batch-2 shape — recipes with a different
      # steps-per-epoch count must export their own) but no new checkpoint:
      # likely a transient relay drop inside the val_interval window --
      # retry, bounded
      soft_strikes=$((soft_strikes + 1))
      strikes=0
      echo "--- transient failure (rc=${rc}) after log progress, no new checkpoint (soft strike ${soft_strikes}/6) ---"
      if [ "${soft_strikes}" -ge 6 ]; then
        echo "--- repeated failures without checkpoint advance; aborting ---"
        exit "${rc}"
      fi
    else
      strikes=$((strikes + 1))
      echo "--- failure with no progress (rc=${rc}, strike ${strikes}/3) ---"
      if [ "${strikes}" -ge 3 ]; then exit "${rc}"; fi
    fi
  done
  touch "${dir}/PHASE_DONE"
}
