// Stand-in for mlir/IR/BuiltinOps.h when building native/rtpu_host.cc.
//
// The TensorFlow pip wheel ships the XLA/PJRT C++ headers (which mention
// mlir::ModuleOp in a few virtual-method signatures, xla/pjrt/pjrt_client.h)
// and the MLIR headers, but NOT the LLVM core headers MLIR itself includes —
// so the real header cannot compile from the wheel alone. The host never
// calls those MLIR overloads (StableHLO bytecode is converted through
// xla::ParseMlirModuleStringAndConvertToXlaComputation instead, which takes
// a string); a complete type with the real pointer-sized layout keeps the
// declarations compilable without changing vtable slot order or count.
#ifndef RTPU_MLIR_BUILTIN_OPS_STUB_H_
#define RTPU_MLIR_BUILTIN_OPS_STUB_H_
namespace mlir {
class Operation;
class ModuleOp {
 public:
  ModuleOp() = default;

 private:
  Operation* state_ = nullptr;
};
}  // namespace mlir
#endif  // RTPU_MLIR_BUILTIN_OPS_STUB_H_
