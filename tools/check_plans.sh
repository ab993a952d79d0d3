#!/bin/sh
# Mechanical staleness check for PLANS.txt (the executed-plan audit).
#
# PLANS.txt is stale iff product source (src/main, build.sbt) changed
# between the commit stamped in its header and HEAD — a doc/test/bench
# commit does not invalidate the audited plans. Exit 0 = fresh,
# 1 = stale or unstamped. Run from anywhere inside the repo.
set -e
repo=$(git rev-parse --show-toplevel)
plans="$repo/PLANS.txt"
[ -f "$plans" ] || { echo "check_plans: $plans missing" >&2; exit 1; }
stamped=$(sed -n 's/^# generated-at-commit: \([0-9a-f]*\).*/\1/p' "$plans")
if [ -z "$stamped" ]; then
  echo "check_plans: PLANS.txt has no generated-at-commit stamp (pre-round-10 artifact) — regenerate with: sbt 'runMain graft.Explain'" >&2
  exit 1
fi
case "$(sed -n 's/^# generated-at-commit: [0-9a-f]*\(.*\)/\1/p' "$plans")" in
  *DIRTY*) echo "check_plans: PLANS.txt was generated from a dirty tree — regenerate from a clean commit" >&2; exit 1;;
esac
if ! git -C "$repo" cat-file -e "$stamped^{commit}" 2>/dev/null; then
  echo "check_plans: stamped commit $stamped not in this repo" >&2
  exit 1
fi
if git -C "$repo" diff --quiet "$stamped"..HEAD -- src/main build.sbt; then
  echo "check_plans: fresh (stamped $stamped; no product-source change since)"
else
  echo "check_plans: STALE — product source changed since $stamped:" >&2
  git -C "$repo" diff --stat "$stamped"..HEAD -- src/main build.sbt >&2
  exit 1
fi
