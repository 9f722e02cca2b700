# Shared phase-runner helpers for the flagship training recipes
# (run_flagship_lowrate.sh / run_flagship_midrate.sh). Source after
# defining OUT and COMMON.
#
# Phases run to a TOTAL epoch target (persisted in ${dir}/PHASE_TARGET) and
# survive watchdog restarts: train.py exits 75 when host RSS crosses
# --max_host_rss_gb after saving an exact `latest` state, and the loop
# relaunches a fresh process that resumes losslessly (the TPU-relay client
# leaks host memory per upload; the device cache removes the per-step driver
# and this loop covers whatever remains — data/device_cache.py).
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

run_phase () {
  local name=$1 prev=$2 epochs=$3; shift 3
  local dir=${OUT}/${name}
  mkdir -p "${dir}"
  if [ -f "${dir}/PHASE_DONE" ] && [ -d "${dir}/params" ]; then
    echo "--- phase ${name} already complete ---"
    return
  fi
  # bootstrap epoch (always_save) unless resuming this phase
  if [ ! -d "${dir}/params" ] && [ ! -d "${dir}/latest/params" ]; then
    rm -f "${dir}/PHASE_DONE" "${dir}/PHASE_TARGET"  # stale committed markers
    local load=""
    if [ -n "${prev}" ]; then load="--load_model --checkpoints_dir ${prev}"; fi
    python train.py ${COMMON} "$@" ${load} \
      --save_dir "${dir}" --num_epochs 1 --always_save --val_interval 1
  fi
  if [ ! -f "${dir}/PHASE_TARGET" ]; then
    echo $(( $(done_epochs "${dir}") + epochs )) > "${dir}/PHASE_TARGET"
  fi
  local target
  target=$(cat "${dir}/PHASE_TARGET")
  while true; do
    local done rem rc
    done=$(done_epochs "${dir}")
    rem=$(( target - done ))
    if [ "${rem}" -le 0 ]; then break; fi
    echo "--- phase ${name}: ${done}/${target} epochs checkpointed, running ${rem} more ---"
    set +e
    python train.py ${COMMON} "$@" \
      --load_model --checkpoints_dir "${dir}" \
      --save_dir "${dir}" --num_epochs "${rem}"
    rc=$?
    set -e
    if [ "${rc}" -eq 0 ]; then
      break
    elif [ "${rc}" -eq 75 ]; then
      echo "--- watchdog restart (host RSS cap) ---"
    else
      exit "${rc}"
    fi
  done
  touch "${dir}/PHASE_DONE"
}
